"""Forward-output parity against the PyTorch reference implementation.

These tests load the untouched reference code from /root/reference (read-only,
skipped when absent), randomize a torch model, export its state_dict, import it
through our .pth shim, and assert the JAX forward matches the torch forward.
"""
import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_arch():
    sys.path.insert(0, REFERENCE_DIR)
    import arch_unet

    yield arch_unet
    sys.path.remove(REFERENCE_DIR)


def _to_numpy_state(net):
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}


def _forward_torch(net, x_nchw):
    net.eval()
    with torch.no_grad():
        y = net(torch.from_numpy(x_nchw))
    return y.numpy()


def _forward_jax(model, params, x_nchw):
    import jax.numpy as jnp

    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    y = model.apply({"params": params}, x)
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@requires_reference
@pytest.mark.parametrize("blindspot", [False, True])
def test_unet_parity(ref_arch, rng, blindspot):
    from image_denoising_tpu.ckpt.pth_import import import_pth
    from image_denoising_tpu.models import UNet

    torch.manual_seed(0)
    net = ref_arch.UNet(in_nc=1, out_nc=1, n_feature=16, blindspot=blindspot)
    sd = _to_numpy_state(net)
    params = import_pth(sd, "UNet")

    x = rng.random((2, 1, 64, 64), dtype=np.float32)
    y_ref = _forward_torch(net, x)
    model = UNet(in_nc=1, out_nc=1, n_feature=16, blindspot=blindspot)
    y_jax = _forward_jax(model, params, x)
    np.testing.assert_allclose(y_jax, y_ref, atol=2e-5, rtol=1e-4)


@requires_reference
def test_resnet_parity(ref_arch, rng):
    from image_denoising_tpu.ckpt.pth_import import import_pth
    from image_denoising_tpu.models import RESNET

    torch.manual_seed(1)
    net = ref_arch.RESNET(in_nc=1, out_nc=1, n_feature=16)
    sd = _to_numpy_state(net)
    params = import_pth(sd, "RESNET")

    x = rng.random((1, 1, 48, 48), dtype=np.float32)
    y_ref = _forward_torch(net, x)
    model = RESNET(in_nc=1, out_nc=1, n_feature=16)
    y_jax = _forward_jax(model, params, x)
    np.testing.assert_allclose(y_jax, y_ref, atol=2e-5, rtol=1e-4)


@requires_reference
def test_improved_unet_parity(ref_arch, rng):
    from image_denoising_tpu.ckpt.pth_import import import_pth
    from image_denoising_tpu.models import ImprovedUNet

    torch.manual_seed(2)
    net = ref_arch.ImprovedUNet(in_nc=1, out_nc=1, n_feature=16)
    sd = _to_numpy_state(net)
    params = import_pth(sd, "UNetImproved")

    x = rng.random((1, 1, 64, 64), dtype=np.float32)
    y_ref = _forward_torch(net, x)
    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=16)
    y_jax = _forward_jax(model, params, x)
    np.testing.assert_allclose(y_jax, y_ref, atol=2e-5, rtol=1e-4)


@requires_reference
def test_improved_unet_rgb_parity(ref_arch, rng):
    from image_denoising_tpu.ckpt.pth_import import import_pth
    from image_denoising_tpu.models import ImprovedUNet

    torch.manual_seed(3)
    net = ref_arch.ImprovedUNet(in_nc=3, out_nc=3, n_feature=16)
    sd = _to_numpy_state(net)
    params = import_pth(sd, "UNetImproved")

    x = rng.random((1, 3, 32, 32), dtype=np.float32)
    y_ref = _forward_torch(net, x)
    model = ImprovedUNet(in_nc=3, out_nc=3, n_feature=16)
    y_jax = _forward_jax(model, params, x)
    np.testing.assert_allclose(y_jax, y_ref, atol=2e-5, rtol=1e-4)
