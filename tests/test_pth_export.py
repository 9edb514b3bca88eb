"""Round-trip: our params → .pth → reference torch model → same forward."""
import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

torch = pytest.importorskip("torch")


@requires_reference
@pytest.mark.parametrize("arch", ["UNet", "RESNET", "UNetImproved"])
def test_export_roundtrip_backbones(arch, rng, tmp_path):
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.ckpt.pth_export import export_pth
    from image_denoising_tpu.models.registry import build_model

    sys.path.insert(0, REFERENCE_DIR)
    try:
        import arch_unet

        model = build_model(arch, n_channel=1, n_feature=16)
        x = jnp.zeros((1, 64, 64, 1))
        params = model.init(jax.random.PRNGKey(3), x)["params"]

        path = export_pth(params, arch, str(tmp_path / "m.pth"))
        ref_cls = {"UNet": arch_unet.UNet, "RESNET": arch_unet.RESNET,
                   "UNetImproved": arch_unet.ImprovedUNet}[arch]
        net = ref_cls(in_nc=1, out_nc=1, n_feature=16)
        missing, unexpected = net.load_state_dict(
            torch.load(path, weights_only=True), strict=True
        ) if True else (None, None)
        net.eval()

        xin = rng.random((1, 1, 64, 64), dtype=np.float32)
        with torch.no_grad():
            y_ref = net(torch.from_numpy(xin)).numpy()
        y_ours = np.transpose(
            np.asarray(model.apply({"params": params},
                                   jnp.asarray(np.transpose(xin, (0, 2, 3, 1))))),
            (0, 3, 1, 2),
        )
        np.testing.assert_allclose(y_ours, y_ref, atol=2e-5, rtol=1e-4)
    finally:
        sys.path.remove(REFERENCE_DIR)


@requires_reference
def test_export_roundtrip_adapter(rng, tmp_path):
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.adapters import build_memory_adapter
    from image_denoising_tpu.ckpt.pth_export import export_pth
    from image_denoising_tpu.ckpt.pth_import import import_pth, load_state_dict

    model = build_memory_adapter("hyper_gated_fft", 1, 16)
    args = [jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
            for _ in range(3)]
    params = model.init(jax.random.PRNGKey(0), *args)["params"]

    path = export_pth(params, "hyper_gated_fft", str(tmp_path / "a.pth"))
    # re-import and compare trees exactly
    params2 = import_pth(load_state_dict(path), "hyper_gated_fft")
    import jax.tree_util as jtu

    for a, b in zip(jtu.tree_leaves(params), jtu.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


@requires_reference
def test_dataparallel_prefix_strip(rng, tmp_path):
    """module.-prefixed (DataParallel) checkpoints load transparently."""
    import sys

    sys.path.insert(0, REFERENCE_DIR)
    try:
        import arch_unet

        from image_denoising_tpu.ckpt.pth_import import import_pth, load_state_dict

        torch.manual_seed(9)
        net = arch_unet.ImprovedUNet(in_nc=1, out_nc=1, n_feature=16)
        sd = {f"module.{k}": v for k, v in net.state_dict().items()}
        path = str(tmp_path / "dp.pth")
        torch.save(sd, path)

        params = import_pth(load_state_dict(path), "UNetImproved")
        import jax.numpy as jnp

        from image_denoising_tpu.models import ImprovedUNet

        model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=16)
        x = rng.random((1, 1, 32, 32), dtype=np.float32)
        with torch.no_grad():
            y_ref = net(torch.from_numpy(x)).numpy()
        y = model.apply({"params": params},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        np.testing.assert_allclose(
            np.transpose(np.asarray(y), (0, 3, 1, 2)), y_ref, atol=2e-5, rtol=1e-4
        )
    finally:
        sys.path.remove(REFERENCE_DIR)
