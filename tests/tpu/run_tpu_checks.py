"""On-device TPU checks for the Pallas kernels (run manually on TPU hardware;
the CPU test suite covers interpret-mode parity where lowerings exist).

Usage: python tests/tpu/run_tpu_checks.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def check_retrieval():
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.memory.retrieval_pallas import (
        pad_bank_for_retrieval,
        top1_l2_retrieval,
    )

    rng = np.random.default_rng(0)
    b, n, d = 8, 4096, 4096
    bank = rng.random((n, d), dtype=np.float32)
    queries = bank[rng.integers(0, n, b)] + rng.normal(0, 0.01, (b, d)).astype(
        np.float32
    )
    sqn = np.sum(bank**2, axis=1)
    dists = (
        np.sum(queries**2, 1, keepdims=True) + sqn[None, :] - 2 * queries @ bank.T
    )
    idx_ref = np.argmin(dists, axis=1)

    bank_j, sqn_j = pad_bank_for_retrieval(jnp.asarray(bank), jnp.asarray(sqn))
    idx = top1_l2_retrieval(jnp.asarray(queries), bank_j, sqn_j)
    idx = np.asarray(jax.block_until_ready(idx))
    assert np.array_equal(idx, idx_ref), (idx, idx_ref)

    t0 = time.perf_counter()
    for _ in range(10):
        idx = top1_l2_retrieval(jnp.asarray(queries), bank_j, sqn_j)
    jax.block_until_ready(idx)
    dt = (time.perf_counter() - t0) / 10
    print(f"retrieval kernel OK: B={b} N={n} D={d}, {dt * 1e3:.2f} ms/call")


def check_retrieval_int8():
    """Compiled int8 kernel: exact-integer distances, 4x fewer bank bytes
    streamed than f32 (PERF: retrieval at production scale is HBM-bound)."""
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.memory.retrieval_pallas import (
        pad_bank_for_retrieval,
        top1_l2_retrieval,
    )

    rng = np.random.default_rng(3)
    b, n, d = 8, 4096, 4096
    bank_u8 = rng.integers(0, 256, (n, d))
    bank_i8 = (bank_u8 - 128).astype(np.int8)
    sqn = np.sum(bank_i8.astype(np.int64) ** 2, axis=1).astype(np.int32)
    q_i8 = bank_i8[rng.integers(0, n, b)]

    qi = q_i8.astype(np.int64)
    bi = bank_i8.astype(np.int64)
    dists = np.sum(qi**2, 1, keepdims=True) + np.sum(bi**2, 1)[None] - 2 * qi @ bi.T
    idx_ref = np.argmin(dists, axis=1)

    bank_j, sqn_j = pad_bank_for_retrieval(jnp.asarray(bank_i8), jnp.asarray(sqn))
    idx = top1_l2_retrieval(jnp.asarray(q_i8), bank_j, sqn_j)
    idx = np.asarray(jax.block_until_ready(idx))
    assert np.array_equal(idx, idx_ref), (idx, idx_ref)

    t0 = time.perf_counter()
    for _ in range(10):
        idx = top1_l2_retrieval(jnp.asarray(q_i8), bank_j, sqn_j)
    np.asarray(idx)  # real D2H fetch (block_until_ready can return early)
    dt = (time.perf_counter() - t0) / 10
    print(f"int8 retrieval kernel OK (exact): B={b} N={n} D={d}, "
          f"{dt * 1e3:.2f} ms/call")


def check_subsampler():
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.ops.neighbor import generate_subimages
    from image_denoising_tpu.ops.neighbor_pallas import subsample_pair_pallas

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((4, 256, 256, 1), dtype=np.float32))
    sub1, sub2, (sel1, sel2) = jax.block_until_ready(
        subsample_pair_pallas(7, img)
    )
    np.testing.assert_allclose(
        np.asarray(sub1), np.asarray(generate_subimages(img, sel1)), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(sub2), np.asarray(generate_subimages(img, sel2)), atol=0
    )
    s1 = np.asarray(sel1).reshape(-1)
    s2 = np.asarray(sel2).reshape(-1)
    valid_pairs = {(0, 1), (0, 2), (1, 3), (2, 3), (1, 0), (2, 0), (3, 1), (3, 2)}
    pairs = set(zip(s1.tolist(), s2.tolist()))
    assert pairs <= valid_pairs, pairs - valid_pairs
    counts = np.zeros(8)
    lut = {p: i for i, p in enumerate(sorted(valid_pairs))}
    for p in zip(s1, s2):
        counts[lut[(int(p[0]), int(p[1]))]] += 1
    freq = counts / counts.sum()
    assert np.all(np.abs(freq - 1 / 8) < 0.02), freq

    # determinism
    a = subsample_pair_pallas(3, img)
    b = subsample_pair_pallas(3, img)
    np.testing.assert_array_equal(np.asarray(a[2][0]), np.asarray(b[2][0]))
    print("subsampler kernel OK: pairs valid, uniform, deterministic")


def check_memory_wrapper_at_scale():
    """Memory adapter + streaming retrieval on a production-sized bf16 bank."""
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter
    from image_denoising_tpu.adapters.wrappers import select_memory_patch
    from image_denoising_tpu.models import ImprovedUNet

    rng = np.random.default_rng(2)
    p, c = 128, 1
    n = 16 * 512  # 8192 patches (a stride-8 single-image bank)
    d = p * p * c
    bank_noise = rng.random((n, d), dtype=np.float32).astype(np.float32)
    bank_clean = rng.random((n, p, p, c), dtype=np.float32)
    sq = np.sum(bank_noise.astype(np.float32) ** 2, axis=1)

    queries = bank_noise[rng.integers(0, n, 4)].reshape(4, p, p, c) + (
        rng.normal(0, 0.01, (4, p, p, c)).astype(np.float32)
    )

    bank_bf16 = jnp.asarray(bank_noise, jnp.bfloat16)
    got_pallas = select_memory_patch(
        jnp.asarray(queries), bank_bf16, jnp.asarray(bank_clean),
        jnp.asarray(sq), use_pallas=True,
    )
    got_xla = select_memory_patch(
        jnp.asarray(queries), bank_bf16, jnp.asarray(bank_clean),
        jnp.asarray(sq), use_pallas=False,
    )
    np.testing.assert_allclose(
        np.asarray(got_pallas), np.asarray(got_xla), atol=0
    )

    # int8 bank: exact integer distances on the MXU's int8 path must pick
    # the same patches as f32 on uint8-sourced data (CPU pins semantics;
    # this verifies the TPU int8 dot produces exact int32 accumulation)
    bank_u8 = rng.integers(0, 256, (n, d)).astype(np.uint8)
    bank_i = bank_u8.astype(np.int32) - 128
    q_u8 = bank_u8[rng.integers(0, n, 4)].reshape(4, p, p, c)
    got_i8 = select_memory_patch(
        jnp.asarray(q_u8.astype(np.float32) / 255.0),
        jnp.asarray(bank_i.astype(np.int8)), jnp.asarray(bank_clean),
        jnp.asarray(np.sum(bank_i * bank_i, axis=1).astype(np.int32)),
    )
    got_f32 = select_memory_patch(
        jnp.asarray(q_u8.astype(np.float32) / 255.0),
        jnp.asarray(bank_u8.astype(np.float32) / 255.0),
        jnp.asarray(bank_clean), None,
    )
    np.testing.assert_allclose(np.asarray(got_i8), np.asarray(got_f32), atol=0)
    print("int8 bank retrieval OK: exact-match with f32 on hardware")

    # whole wrapper forward with pallas retrieval — one compile only
    # (init_with_output runs the full forward; a second jit of the same
    # forward has been seen to overload this host's remote-compile tunnel)
    model = ImprovedUNet(in_nc=c, out_nc=c, n_feature=16)
    wrapper = DenoiserWithMemoryAdapter(
        base=model, in_channels=c, hidden_channels=16, pallas_retrieval=True
    )
    out, _ = jax.jit(wrapper.init_with_output)(
        jax.random.PRNGKey(0), jnp.asarray(queries), bank_bf16,
        jnp.asarray(bank_clean), jnp.asarray(sq),
    )
    out = jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out)).all()
    print(f"memory wrapper at scale OK: bank {n}x{d} bf16, pallas == xla argmin")


def check_fused_chain():
    """Compiled fused conv chain (lead→RDB→conv0) vs the XLA path on-chip."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from image_denoising_tpu.models.improved_unet import RDB
    from image_denoising_tpu.models.layers import Conv, leaky_relu
    from image_denoising_tpu.ops.fused_block_pallas import (
        FusedChainWeights,
        fused_rdb_chain,
    )

    class LevelHead(nn.Module):
        nf: int

        @nn.compact
        def __call__(self, x):
            x = leaky_relu(Conv(self.nf, init="torch", name="down0_conv")(x))
            x = RDB(self.nf, name="down0_rdb")(x)
            c0 = Conv(self.nf, use_bias=False, init="torch", name="res_c0")(x)
            return x, c0

    rng = np.random.default_rng(3)
    m = LevelHead(nf=16)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 2)), jnp.float32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]
    ref_rdb, ref_c0 = jax.jit(lambda p, v: m.apply({"params": p}, v))(params, x)
    ref_rdb, ref_c0 = np.asarray(ref_rdb), np.asarray(ref_c0)

    p2 = dict(params)
    p2["res_fake"] = {
        "conv0": {"conv": {"kernel": params["res_c0"]["conv"]["kernel"]}}
    }
    wts = FusedChainWeights(p2, lead="down0_conv", rdb="down0_rdb",
                            res="res_fake")
    out_rdb, out_c0 = jax.jit(
        lambda v: fused_rdb_chain(v, wts, s_rows=32)
    )(x)
    d1 = float(np.max(np.abs(np.asarray(out_rdb) - ref_rdb)))
    d2 = float(np.max(np.abs(np.asarray(out_c0) - ref_c0)))
    assert d1 < 1e-2 and d2 < 1e-2, (d1, d2)
    print(f"fused chain kernel OK: rdb diff {d1:.1e}, c0 diff {d2:.1e}")


def check_device_metrics():
    """--device_metrics accuracy on REAL hardware: f32 PSNR/SSIM on the TPU
    vs the host float64 MATLAB-SSIM / f32 PSNR (the CPU tests pin this on the
    CPU backend; TPU f32 matmul/conv rounding differs, so verify on-chip)."""
    import jax

    from image_denoising_tpu.metrics import (calculate_psnr, calculate_ssim,
                                             make_device_metrics)

    rng = np.random.default_rng(4)
    clean = rng.integers(0, 256, (4, 352, 352)).astype(np.uint8)
    pred = np.clip(
        clean.astype(np.float32) + rng.normal(0, 12, clean.shape), 0, 255
    ).astype(np.uint8)
    fn = make_device_metrics(iq_iou=True)
    psnr_d, ssim_d, ious_d = (
        np.asarray(x) for x in jax.block_until_ready(fn(pred, clean))
    )
    from image_denoising_tpu.metrics import compute_iq_iou

    for k in range(4):
        dp = abs(psnr_d[k] - calculate_psnr(pred[k], clean[k], zero_mse_psnr=None))
        ds = abs(ssim_d[k] - calculate_ssim(pred[k], clean[k]))
        assert dp < 1e-2 and ds < 1e-4, (k, dp, ds)
        di = np.abs(ious_d[k] - compute_iq_iou(pred[k], clean[k])).max()
        assert di < 1e-6, (k, di)
    # E6's psnr-only scorer (ssim=False) is a distinct compiled program —
    # validate the exact layout/values the memory eval CLI consumes
    fn6 = make_device_metrics(iq_iou=True, ssim=False)
    out6 = jax.block_until_ready(fn6(pred, clean))
    assert len(out6) == 2
    np.testing.assert_allclose(np.asarray(out6[0]), psnr_d, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out6[1]), ious_d, atol=1e-6)

    print("device metrics OK: TPU f32 PSNR/SSIM/IQ-IoU within "
          "1e-2 dB / 1e-4 / 1e-6 of host f64 (+ psnr-only scorer)")


if __name__ == "__main__":
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    check_retrieval()
    check_retrieval_int8()
    check_subsampler()
    check_memory_wrapper_at_scale()
    check_fused_chain()
    check_device_metrics()
    print("ALL TPU CHECKS PASSED")
