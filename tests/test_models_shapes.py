import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_denoising_tpu.models import UNet, RESNET, ImprovedUNet, build_model
from image_denoising_tpu.models.registry import build_model_from_log_name


@pytest.mark.parametrize("blindspot", [False, True])
def test_unet_shapes(blindspot):
    model = UNet(in_nc=1, out_nc=1, n_feature=16, blindspot=blindspot)
    x = jnp.zeros((2, 64, 64, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 64, 64, 1)


def test_unet_rgb_shapes():
    model = UNet(in_nc=3, out_nc=3, n_feature=16)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 32, 32, 3)


def test_resnet_shapes_and_residual():
    model = RESNET(in_nc=1, out_nc=1, n_feature=16)
    x = jnp.ones((1, 32, 32, 1)) * 0.5
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    # global residual: with tiny-init head the output stays near the input
    assert float(jnp.abs(y - x).max()) < 1.0


@pytest.mark.slow
def test_improved_unet_shapes_and_sigmoid_range():
    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=16)
    x = jnp.linspace(0, 1, 1 * 32 * 32).reshape(1, 32, 32, 1)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_registry_dispatch():
    assert isinstance(build_model("UNet", 1, 16), UNet)
    assert isinstance(build_model("RESNET", 1, 16), RESNET)
    assert isinstance(build_model("UNetImproved", 1, 16), ImprovedUNet)
    with pytest.raises(ValueError):
        build_model("nope")

    m = build_model_from_log_name("UNET_blindspot_run", 1, 16)
    assert isinstance(m, UNet) and m.blindspot
    m = build_model_from_log_name("my_UNetImproved_x", 1, 16)
    assert isinstance(m, ImprovedUNet)
    with pytest.raises(ValueError):
        build_model_from_log_name("garbage")


def test_unet_jit_compiles():
    model = UNet(in_nc=1, out_nc=1, n_feature=16)
    x = jnp.zeros((1, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    fn = jax.jit(lambda p, v: model.apply(p, v))
    y = fn(params, x)
    assert y.shape == x.shape


@pytest.mark.slow
def test_improved_unet_remat_equivalence(rng):
    """remat=True must not change outputs, grads, or param naming."""
    import numpy as np

    base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=16)
    remat = ImprovedUNet(in_nc=1, out_nc=1, n_feature=16, remat=True)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 1), dtype=np.float32))
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    params_r = remat.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_r)

    y0 = base.apply({"params": params}, x)
    y1 = remat.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def loss(p, model):
        return jnp.mean((model.apply({"params": p}, x) - 0.5) ** 2)

    g0 = jax.grad(lambda p: loss(p, base))(params)
    g1 = jax.grad(lambda p: loss(p, remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("k", [0, 2, 5])
def test_improved_unet_remat_depth_equivalence(k):
    """Selective remat (remat_depth=k — only the k highest-resolution levels
    rematerialize) must not change outputs, grads, or param naming vs the
    full-remat model. k=0 degenerates to no remat, k=5 (> depth) to full."""
    import numpy as np

    full = ImprovedUNet(in_nc=1, out_nc=1, n_feature=16, remat=True)
    sel = ImprovedUNet(in_nc=1, out_nc=1, n_feature=16, remat=True,
                       remat_depth=k)
    x = jnp.asarray(np.random.default_rng(1).random((2, 32, 32, 1), dtype=np.float32))
    params = full.init(jax.random.PRNGKey(0), x)["params"]
    params_s = sel.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_s))

    y0 = full.apply({"params": params}, x)
    y1 = sel.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def loss(p, model):
        return jnp.mean((model.apply({"params": p}, x) - 0.5) ** 2)

    g0 = jax.grad(lambda p: loss(p, full))(params)
    g1 = jax.grad(lambda p: loss(p, sel))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_unet_rejects_indivisible_dims():
    model = UNet(in_nc=1, out_nc=1, n_feature=8)
    with pytest.raises(ValueError, match="divisible by 32"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 176, 176, 1)))


def test_improved_unet_rejects_indivisible_dims():
    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=16)
    with pytest.raises(ValueError, match="divisible by 16"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 40, 40, 1)))
