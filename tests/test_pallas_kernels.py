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
