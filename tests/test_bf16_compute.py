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


@pytest.mark.slow
def test_bf16_f32_loss_trajectory_50_steps():
    """Multi-step equivalence of the production bf16 fast path (VERDICT r3
    weak #6): 50 structure-loss train steps from identical inits on identical
    data must keep the bf16 loss trajectory inside a tight envelope of f32 —
    upgrading the per-step 2e-3 claim (PERF §6) to trajectory scale — and
    both runs must actually LEARN (monotone-ish loss decrease)."""
    from image_denoising_tpu.train import (create_train_state,
                                           make_structure_train_step)

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:32, 0:32]
    clean = np.stack([
        (120 + 60 * np.sin(xx / 5 + i) + 30 * np.cos(yy / 7)).astype(np.uint8)
        for i in range(4)
    ])[..., None]
    noisy = np.clip(
        clean.astype(np.float32) + rng.normal(0, 15, clean.shape), 0, 255
    ).astype(np.uint8)

    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=8, dtype=dtype)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32)
        )["params"]
        state = create_train_state(params, lr=3e-4)
        step = make_structure_train_step(model.apply)
        traj = []
        for _ in range(50):
            state, m = step(state, clean, noisy)
            traj.append(float(m["loss"]))
        losses[dtype] = np.asarray(traj)

    f32, bf16 = losses[jnp.float32], losses[jnp.bfloat16]
    assert np.isfinite(f32).all() and np.isfinite(bf16).all()
    # identical init ⇒ early steps nearly equal; divergence stays bounded
    # relative to the loss scale across the whole trajectory
    assert abs(f32[0] - bf16[0]) < 5e-3, (f32[0], bf16[0])
    rel = np.abs(f32 - bf16) / np.maximum(np.abs(f32), 1e-3)
    assert rel.max() < 0.15, (rel.max(), rel.argmax())
    assert abs(f32[-1] - bf16[-1]) / abs(f32[-1]) < 0.10, (f32[-1], bf16[-1])
    # both learn: mean of last 5 losses well below mean of first 5
    assert f32[-5:].mean() < 0.8 * f32[:5].mean(), f32
    assert bf16[-5:].mean() < 0.8 * bf16[:5].mean(), bf16


def test_output_adapter_bf16_base():
    base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=8, dtype=jnp.bfloat16)
    wrapper = DenoiserWithAdapter(base=base, in_channels=1, hidden_channels=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32))
    params = jax.jit(wrapper.init)(jax.random.PRNGKey(0), x)["params"]
    out = wrapper.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out, np.float32)).all()
