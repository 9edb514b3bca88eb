"""Parity of the adapter zoo + memory retrieval vs the PyTorch reference."""
import sys
import types

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mods():
    # finetune_memory imports torchvision (unused at module import time in the
    # parts we need) — stub it if absent.
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            fake = types.ModuleType("torchvision")
            fake.transforms = types.ModuleType("torchvision.transforms")
            sys.modules["torchvision"] = fake
            sys.modules["torchvision.transforms"] = fake.transforms
    sys.path.insert(0, REFERENCE_DIR)
    import adapter as ref_adapter
    import finetune_memory as ref_mem

    yield ref_adapter, ref_mem
    sys.path.remove(REFERENCE_DIR)


def _sd(net):
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _triple(rng, b=2, c=1, h=32, w=32):
    return [rng.random((b, c, h, w), dtype=np.float32) for _ in range(3)]


@requires_reference
def test_output_adapter_parity(ref_mods, rng):
    import jax.numpy as jnp

    from image_denoising_tpu.adapters import OutputAdapter
    from image_denoising_tpu.ckpt.pth_import import import_pth

    ref_adapter, _ = ref_mods
    torch.manual_seed(0)
    net = ref_adapter.OutputAdapter(in_channels=1, hidden_channels=16)
    params = import_pth(_sd(net), "output_adapter")

    noisy, base, _ = _triple(rng)
    with torch.no_grad():
        y_ref = net(torch.from_numpy(noisy), torch.from_numpy(base)).numpy()
    model = OutputAdapter(in_channels=1, hidden_channels=16)
    y = model.apply({"params": params}, jnp.asarray(_nhwc(noisy)), jnp.asarray(_nhwc(base)))
    np.testing.assert_allclose(_nchw(y), y_ref, atol=1e-5, rtol=1e-4)


_VARIANTS = [
    ("memory_residual", "MemoryResidualAdapter", {}),
    ("lowfreq_blend", "LowFrequencyBlendAdapter", {}),
    ("tone_curve", "GlobalMonotoneToneCurveAdapter", {}),
    ("hyper_gated", "HyperGatedResidualAdapter", {}),
    ("hyper_gated_fft", "HyperGatedResidualAdapter_FFT", {}),
]


@requires_reference
@pytest.mark.parametrize("variant,ref_cls,kwargs", _VARIANTS)
def test_memory_adapter_parity(ref_mods, rng, variant, ref_cls, kwargs):
    import jax.numpy as jnp

    from image_denoising_tpu.adapters import build_memory_adapter
    from image_denoising_tpu.ckpt.pth_import import import_pth

    _, ref_mem = ref_mods
    torch.manual_seed(1)
    if variant == "tone_curve":
        net = getattr(ref_mem, ref_cls)(in_channels=1, hidden_dim=16, **kwargs)
    else:
        net = getattr(ref_mem, ref_cls)(in_channels=1, hidden_channels=16, **kwargs)
    # randomize the zero-initialized tails so parity is non-trivial
    with torch.no_grad():
        for p in net.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    params = import_pth(_sd(net), variant)

    noisy, base, mem = _triple(rng)
    with torch.no_grad():
        y_ref = net(
            torch.from_numpy(noisy), torch.from_numpy(base), torch.from_numpy(mem)
        ).numpy()
    model = build_memory_adapter(variant, in_channels=1, hidden_channels=16)
    y = model.apply(
        {"params": params},
        jnp.asarray(_nhwc(noisy)), jnp.asarray(_nhwc(base)), jnp.asarray(_nhwc(mem)),
    )
    np.testing.assert_allclose(_nchw(y), y_ref, atol=2e-5, rtol=1e-3)


@requires_reference
def test_memory_adapter_identity_at_init(ref_mods, rng):
    """v1/v4/v5 zero-init ⇒ output == base_out at init (γ·0 + 0)."""
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.adapters import build_memory_adapter

    noisy, base, mem = _triple(rng)
    for variant in ("memory_residual", "hyper_gated", "hyper_gated_fft"):
        model = build_memory_adapter(variant, 1, 16)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(_nhwc(noisy)), jnp.asarray(_nhwc(base)), jnp.asarray(_nhwc(mem)),
        )
        y = model.apply(
            params,
            jnp.asarray(_nhwc(noisy)), jnp.asarray(_nhwc(base)), jnp.asarray(_nhwc(mem)),
        )
        np.testing.assert_allclose(
            _nchw(y), np.clip(base, 0, 1), atol=1e-6,
            err_msg=f"variant {variant} not identity at init",
        )


@requires_reference
def test_memory_retrieval_parity(ref_mods, rng):
    """Top-1 L2 retrieval matches torch incl. first-min tie-breaking."""
    import jax.numpy as jnp

    from image_denoising_tpu.adapters.wrappers import select_memory_patch

    n, p, c, b = 64, 8, 1, 4
    bank_noise = rng.random((n, c, p, p), dtype=np.float32)
    bank_clean = rng.random((n, c, p, p), dtype=np.float32)
    queries = bank_noise[rng.integers(0, n, b)] + rng.normal(
        0, 0.01, (b, c, p, p)
    ).astype(np.float32)

    # torch oracle (reference math, finetune_memory.py:1256-1277)
    tq = torch.from_numpy(queries).reshape(b, -1)
    tb = torch.from_numpy(bank_noise).reshape(n, -1)
    d = tq.pow(2).sum(1, keepdim=True) + tb.pow(2).sum(1)[None, :] - 2 * tq @ tb.t()
    idx_ref = d.argmin(dim=1).numpy()

    out = select_memory_patch(
        jnp.asarray(_nhwc(queries)),
        jnp.asarray(bank_noise.reshape(n, -1)),
        jnp.asarray(_nhwc(bank_clean).reshape(n, p, p, c)),
    )
    expected = _nhwc(bank_clean)[idx_ref]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_bank_extract_patches_matches_unfold(rng):
    """extract_patches ordering equals torch F.unfold row-major grid."""
    import torch.nn.functional as F

    from image_denoising_tpu.memory import extract_patches

    img = rng.random((20, 24), dtype=np.float32)
    p, s = 8, 4
    ours = extract_patches(img, p, s)  # [N,p,p,1]

    t = torch.from_numpy(img)[None, None]
    unf = F.unfold(t, kernel_size=p, stride=s)  # [1, p*p, L]
    oracle = unf[0].T.reshape(-1, 1, p, p).numpy()  # [L,1,p,p]
    np.testing.assert_allclose(ours[..., 0], oracle[:, 0], atol=0)
