"""bf16-compute robustness: every adapter variant must run with a bf16 base.

Regression: the hyper-gated-FFT adapter crashed under ``--dtype bfloat16``
because XLA's RFFT is f32-only (row_fft_features now promotes). Params stay
f32 throughout; only compute flips.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_denoising_tpu.adapters import (
    DenoiserWithAdapter,
    DenoiserWithMemoryAdapter,
)
from image_denoising_tpu.models import ImprovedUNet


@pytest.mark.parametrize("variant", [
    "memory_residual", "lowfreq_blend", "tone_curve",
    "hyper_gated", "hyper_gated_fft",
])
def test_memory_adapter_variants_bf16_base(variant):
    base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=8, dtype=jnp.bfloat16)
    wrapper = DenoiserWithMemoryAdapter(
        base=base, in_channels=1, hidden_channels=8, variant=variant
    )
    rng = np.random.default_rng(0)
    ps, n_bank = 32, 6
    bank_noise = rng.random((n_bank, ps * ps), dtype=np.float32)
    bank_clean = rng.random((n_bank, ps, ps, 1), dtype=np.float32)
    sq = np.sum(bank_noise**2, axis=1)
    tiles = jnp.asarray(rng.random((2, ps, ps, 1), dtype=np.float32))

    params = jax.jit(wrapper.init)(
        jax.random.PRNGKey(0), tiles, jnp.asarray(bank_noise),
        jnp.asarray(bank_clean), jnp.asarray(sq)
    )["params"]
    # params stay f32 even with a bf16-compute base
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)

    out = wrapper.apply(
        {"params": params}, tiles, jnp.asarray(bank_noise),
        jnp.asarray(bank_clean), jnp.asarray(sq)
    )
    assert out.shape == (2, ps, ps, 1)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_output_adapter_bf16_base():
    base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=8, dtype=jnp.bfloat16)
    wrapper = DenoiserWithAdapter(base=base, in_channels=1, hidden_channels=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32))
    params = jax.jit(wrapper.init)(jax.random.PRNGKey(0), x)["params"]
    out = wrapper.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out, np.float32)).all()
