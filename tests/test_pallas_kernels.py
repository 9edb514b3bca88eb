"""Pallas kernels in interpret mode on CPU (compiled-mode parity is exercised
on real TPU by tests/tpu/run_tpu_checks.py).

The subsampler kernel uses the TPU on-core PRNG (pltpu.prng_seed), which has
no CPU interpret lowering in this JAX version — those tests skip on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu_prng = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_* has no CPU interpret lowering",
)


def test_retrieval_kernel_matches_xla_interpret(rng):
    from jax.experimental import pallas as pl

    from image_denoising_tpu.memory.retrieval_pallas import (
        pad_bank_for_retrieval,
        top1_l2_retrieval,
    )

    b, n, d = 4, 96, 256
    bank = rng.random((n, d), dtype=np.float32)
    queries = bank[rng.integers(0, n, b)] + rng.normal(0, 0.01, (b, d)).astype(
        np.float32
    )
    sqn = np.sum(bank**2, axis=1)

    # XLA oracle
    dists = (
        np.sum(queries**2, 1, keepdims=True) + sqn[None, :] - 2 * queries @ bank.T
    )
    idx_ref = np.argmin(dists, axis=1)

    bank_j, sqn_j = pad_bank_for_retrieval(
        jnp.asarray(bank), jnp.asarray(sqn), tile_n=32
    )
    import image_denoising_tpu.memory.retrieval_pallas as rp

    # run in interpret mode by monkeypatching pallas_call kwargs via env:
    # pl.pallas_call doesn't take interpret from here, so wrap
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pl.pallas_call = patched
    try:
        idx = rp.top1_l2_retrieval(
            jnp.asarray(queries), bank_j, sqn_j, tile_n=32, tile_d=64
        )
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)


@requires_tpu_prng
def test_subsampler_pallas_matches_contract(rng):
    from image_denoising_tpu.ops.neighbor import generate_subimages
    from image_denoising_tpu.ops.neighbor_pallas import subsample_pair_pallas

    img = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    sub1, sub2, (sel1, sel2) = subsample_pair_pallas(7, img, interpret=True)

    assert sub1.shape == (2, 8, 8, 3)
    s1, s2 = np.asarray(sel1), np.asarray(sel2)
    valid_pairs = {(0, 1), (0, 2), (1, 3), (2, 3), (1, 0), (2, 0), (3, 1), (3, 2)}
    pairs = set(zip(s1.reshape(-1).tolist(), s2.reshape(-1).tolist()))
    assert pairs <= valid_pairs

    # sub-images equal the XLA gather with the same selectors
    np.testing.assert_allclose(
        np.asarray(sub1), np.asarray(generate_subimages(img, sel1)), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(sub2), np.asarray(generate_subimages(img, sel2)), atol=0
    )


@requires_tpu_prng
def test_subsampler_pallas_deterministic(rng):
    from image_denoising_tpu.ops.neighbor_pallas import subsample_pair_pallas

    img = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    a = subsample_pair_pallas(3, img, interpret=True)
    b = subsample_pair_pallas(3, img, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[2][0]), np.asarray(b[2][0]))
    c = subsample_pair_pallas(4, img, interpret=True)
    assert not np.array_equal(np.asarray(a[2][0]), np.asarray(c[2][0]))


@requires_tpu_prng
def test_subsampler_pallas_uniformity(rng):
    from image_denoising_tpu.ops.neighbor_pallas import subsample_pair_pallas

    img = jnp.asarray(rng.random((1, 128, 128, 1), dtype=np.float32))
    _, _, (sel1, sel2) = subsample_pair_pallas(11, img, interpret=True)
    s1 = np.asarray(sel1).reshape(-1)
    s2 = np.asarray(sel2).reshape(-1)
    lut = {p: i for i, p in enumerate(sorted(
        {(0, 1), (0, 2), (1, 3), (2, 3), (1, 0), (2, 0), (3, 1), (3, 2)}))}
    counts = np.zeros(8)
    for p in zip(s1, s2):
        counts[lut[(int(p[0]), int(p[1]))]] += 1
    freq = counts / counts.sum()
    assert np.all(np.abs(freq - 1 / 8) < 0.03), freq


def test_retrieval_kernel_int8_exact_interpret(rng):
    """int8 bank: the streaming kernel's int32 distances must match the XLA
    int8 oracle EXACTLY (indices equal, not just close), including padded
    rows and first-min tie-breaking."""
    from jax.experimental import pallas as pl

    import image_denoising_tpu.memory.retrieval_pallas as rp

    b, n, d = 4, 90, 256
    bank_u8 = rng.integers(0, 256, (n, d))
    bank_i8 = (bank_u8 - 128).astype(np.int8)
    # duplicate a row to force a tie: first index must win
    bank_i8[57] = bank_i8[3]
    sqn = np.sum(bank_i8.astype(np.int64) ** 2, axis=1).astype(np.int32)

    q_u8 = bank_u8[[3, 10, 20, 88]]
    q_i8 = (q_u8 - 128).astype(np.int8)
    q_i8[0] = bank_i8[3]  # exact-duplicate query hits the tied pair

    # XLA int32 oracle
    qi = q_i8.astype(np.int64)
    bi = bank_i8.astype(np.int64)
    dists = np.sum(qi**2, 1, keepdims=True) + np.sum(bi**2, 1)[None] - 2 * qi @ bi.T
    idx_ref = np.argmin(dists, axis=1)
    assert idx_ref[0] == 3  # tie broke to the first duplicate

    bank_j, sqn_j = rp.pad_bank_for_retrieval(
        jnp.asarray(bank_i8), jnp.asarray(sqn), tile_n=32
    )
    assert int(sqn_j[-1]) == np.iinfo(np.int32).max  # int padding rule

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pl.pallas_call = patched
    try:
        idx = rp.top1_l2_retrieval(
            jnp.asarray(q_i8), bank_j, sqn_j, tile_n=32, tile_d=64
        )
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)


def test_select_memory_patch_int8_pallas_matches_xla(rng):
    """select_memory_patch on an int8 bank: use_pallas=True returns the
    SAME clean patches as the XLA int8 path (both are exact int32)."""
    from jax.experimental import pallas as pl

    from image_denoising_tpu.adapters.wrappers import select_memory_patch
    from image_denoising_tpu.memory.retrieval_pallas import (
        pad_bank_for_retrieval,
    )

    p, c, n, b = 8, 1, 70, 4
    d = p * p * c
    bank_u8 = rng.integers(0, 256, (n, d))
    bank_i8 = jnp.asarray((bank_u8 - 128).astype(np.int8))
    sqn = jnp.asarray(
        np.sum((bank_u8 - 128).astype(np.int64) ** 2, axis=1).astype(np.int32))
    clean = jnp.asarray(rng.random((n, p, p, c), dtype=np.float32))
    noisy = jnp.asarray(
        (bank_u8[rng.integers(0, n, b)] / 255.0).astype(np.float32)
    ).reshape(b, p, p, c)

    ref = select_memory_patch(noisy, bank_i8, clean, sqn, use_pallas=False)

    bank_pad, sqn_pad = pad_bank_for_retrieval(bank_i8, sqn, tile_n=32)
    clean_pad = jnp.concatenate(
        [clean, jnp.zeros((bank_pad.shape[0] - n, p, p, c), jnp.float32)])
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pl.pallas_call = patched
    try:
        # tile_n=32 divides the padded N; tile_d=d (64) divides D
        out = select_memory_patch(noisy, bank_pad, clean_pad, sqn_pad,
                                  use_pallas=True)
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
