import numpy as np
import pytest

import jax.numpy as jnp

from image_denoising_tpu.eval import (
    denoise_tiled_hann,
    denoise_tiled_pyramid,
    edge_aligned_grid,
    hann_window_2d,
    pyramid_weight_mask,
    reference_tile_grid,
)


def _affine_model(x):
    """Deterministic stand-in network: f(x) = 0.8·x + 0.05 (shape-preserving)."""
    return x * 0.8 + 0.05


# ---------------------------------------------------------------------------
# Oracle: direct transcription of the reference python tile loops (numpy)
# ---------------------------------------------------------------------------


def _oracle_pyramid(noisy_u8, ps, overlap, f):
    h, w = noisy_u8.shape
    stride = ps - overlap
    yy, xx = np.meshgrid(np.linspace(0, 1, ps), np.linspace(0, 1, ps), indexing="ij")
    weight_mask = ((1 - np.abs(yy - 0.5) * 2) * (1 - np.abs(xx - 0.5) * 2)).astype(
        np.float32
    )
    denoised = np.zeros((h, w), np.float32)
    contrib = np.zeros((h, w), np.float32)
    l1_vals = []
    for r0 in range(0, h, stride):
        for c0 in range(0, w, stride):
            r1, c1 = min(r0 + ps, h), min(c0 + ps, w)
            patch = noisy_u8[r0:r1, c0:c1].astype(np.float32) / 255.0
            padded = np.pad(
                patch, ((0, ps - patch.shape[0]), (0, ps - patch.shape[1])),
                mode="reflect",
            )
            pred = f(padded)
            l1_vals.append(np.abs(pred - padded).mean())
            pred = np.clip(pred, 0, 1)[: patch.shape[0], : patch.shape[1]]
            wm = weight_mask[: patch.shape[0], : patch.shape[1]]
            denoised[r0:r1, c0:c1] += pred * wm
            contrib[r0:r1, c0:c1] += wm
    contrib[contrib == 0] = 1
    return denoised / contrib, float(np.mean(l1_vals))


def _oracle_hann(noisy, ps, overlap, f):
    h, w = noisy.shape
    arr = noisy.astype(np.float32) / 255.0
    step = ps - overlap
    ys = list(range(0, max(h - ps, 0) + 1, step))
    xs = list(range(0, max(w - ps, 0) + 1, step))
    if ys[-1] != h - ps:
        ys.append(h - ps)
    if xs[-1] != w - ps:
        xs.append(w - ps)
    ys, xs = sorted(set(ys)), sorted(set(xs))
    n = np.arange(ps)
    w1 = 0.5 * (1 - np.cos(2 * np.pi * n / (ps - 1)))
    win = np.maximum(np.outer(w1, w1), 1e-3).astype(np.float32)
    out = np.zeros((h, w), np.float32)
    wsum = np.zeros((h, w), np.float32)
    for y in ys:
        for x in xs:
            pred = f(arr[y : y + ps, x : x + ps])
            out[y : y + ps, x : x + ps] += pred * win
            wsum[y : y + ps, x : x + ps] += win
    return out / (wsum + 1e-8)


# ---------------------------------------------------------------------------


def _wrap(f):
    def model_call(tiles):  # [T,ps,ps,1] -> same
        return f(tiles)

    return model_call


def test_pyramid_matches_reference_loop_exact_fit(rng):
    # 96x96 frame, ps=64, overlap=32 → grid hits edges exactly
    noisy = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    ours, l1 = denoise_tiled_pyramid(_wrap(_affine_model), noisy, ps=64, overlap=32)
    oracle, l1_o = _oracle_pyramid(noisy, 64, 32, _affine_model)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)
    assert abs(l1 - l1_o) < 1e-6


def test_pyramid_matches_reference_loop_ragged(rng):
    # 80x112 frame, ps=64, overlap=32 → ragged edge tiles within reflect limit
    noisy = rng.integers(0, 256, (80, 112)).astype(np.uint8)
    ours, l1 = denoise_tiled_pyramid(_wrap(_affine_model), noisy, ps=64, overlap=32)
    oracle, l1_o = _oracle_pyramid(noisy, 64, 32, _affine_model)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)
    assert abs(l1 - l1_o) < 1e-6


def test_pyramid_identity_partition_of_unity(rng):
    noisy = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    ours, _ = denoise_tiled_pyramid(_wrap(lambda t: t), noisy, ps=64, overlap=32)
    interior = ours[1:-1, 1:-1] * 255.0
    np.testing.assert_allclose(interior, noisy[1:-1, 1:-1], atol=1e-3)
    # reference quirk: border rows/cols get zero pyramid weight → output 0
    assert np.all(ours[0, :] == 0) and np.all(ours[:, 0] == 0)


def test_hann_matches_reference_loop(rng):
    noisy = rng.integers(0, 256, (96, 130)).astype(np.uint8)
    ours = denoise_tiled_hann(_wrap(_affine_model), noisy, ps=64, overlap=32)
    oracle = _oracle_hann(noisy, 64, 32, _affine_model)
    np.testing.assert_allclose(ours[..., 0], oracle, atol=1e-6)


def test_hann_window_matches_torch():
    torch = pytest.importorskip("torch")
    ref = torch.hann_window(64, periodic=False).numpy()
    ref2 = np.maximum(np.outer(ref, ref), 1e-3)
    np.testing.assert_allclose(hann_window_2d(64), ref2, atol=1e-6)


def test_hann_identity_partition_of_unity(rng):
    noisy = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    ours = denoise_tiled_hann(_wrap(lambda t: t), noisy, ps=64, overlap=32)
    np.testing.assert_allclose(ours[..., 0] * 255.0, noisy, atol=1e-2)


def test_edge_aligned_grid_dedup():
    grid = edge_aligned_grid(128, 128, 128, 64)
    assert grid == [(0, 0)]
    grid = edge_aligned_grid(192, 160, 128, 64)
    ys = sorted({g[0] for g in grid})
    xs = sorted({g[1] for g in grid})
    assert ys == [0, 64] and xs == [0, 32]


def test_reference_grid_geometry():
    grid = reference_tile_grid(704, 704, 352, 288)
    r0s = sorted({g[0] for g in grid})
    assert r0s == [0, 288, 576]
    th_at_576 = [g[2] for g in grid if g[0] == 576][0]
    assert th_at_576 == 128


def test_chunked_forward_equivalence(rng):
    noisy = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    full, _ = denoise_tiled_pyramid(_wrap(_affine_model), noisy, ps=64, overlap=32)
    chunked, _ = denoise_tiled_pyramid(
        _wrap(_affine_model), noisy, ps=64, overlap=32, batch=2
    )
    np.testing.assert_allclose(full, chunked, atol=1e-6)


def test_frame_batched_runner_matches_per_frame(rng):
    import jax.numpy as jnp

    from image_denoising_tpu.eval.tiled import make_tiled_pyramid_runner_frames

    frames = np.stack([
        rng.integers(0, 256, (96, 96)).astype(np.uint8) for _ in range(3)
    ])
    run = make_tiled_pyramid_runner_frames(_wrap(_affine_model), 3, 96, 96,
                                           ps=64, overlap=32)
    outs, l1s = run(jnp.asarray(frames))
    for i in range(3):
        single, l1 = denoise_tiled_pyramid(_wrap(_affine_model), frames[i],
                                           ps=64, overlap=32)
        np.testing.assert_allclose(np.asarray(outs)[i], single, atol=1e-6)
        assert abs(float(l1s[i]) - l1) < 1e-6


def test_hann_frames_runner_matches_per_frame(rng):
    """The memory-engine burst runner (make_tiled_hann_runner_frames) must be
    byte-identical to the single-frame Hann path at the SAME tile chunking
    (batch=-2 both sides — conv batch shapes match, so uint8 outputs are
    exact)."""
    from image_denoising_tpu.eval import make_tiled_hann_runner_frames

    frames = np.stack([
        rng.integers(0, 256, (96, 130)).astype(np.uint8) for _ in range(3)
    ])
    run = make_tiled_hann_runner_frames(_wrap(_affine_model), 3, 96, 130,
                                        ps=64, overlap=32, batch=-2,
                                        out_dtype="uint8_round")
    outs = np.asarray(run(jnp.asarray(frames)))
    for i in range(3):
        single = denoise_tiled_hann(_wrap(_affine_model), frames[i],
                                    ps=64, overlap=32, batch=-2,
                                    out_dtype="uint8_round")
        np.testing.assert_array_equal(outs[i], single[..., 0])


def test_scatter_blend_fallback_matches_unrolled(rng, monkeypatch):
    """Grids above _UNROLL_MAX_TILES switch to the O(1)-program-size scatter
    fori_loop blend (huge-frame compile-time guard, ADVICE r2); it must match
    the unrolled pad-and-add form exactly on both engines."""
    import image_denoising_tpu.eval.tiled as tiled

    noisy = rng.integers(0, 256, (80, 112)).astype(np.uint8)  # ragged pyramid
    base_pyr, l1a = denoise_tiled_pyramid(_wrap(_affine_model), noisy,
                                          ps=64, overlap=32)
    base_hann = denoise_tiled_hann(_wrap(_affine_model), noisy,
                                   ps=64, overlap=32)

    monkeypatch.setattr(tiled, "_UNROLL_MAX_TILES", 1)
    # fresh callables → fresh runner-cache keys (the threshold is not keyed)
    sc_pyr, l1b = denoise_tiled_pyramid(_wrap(lambda t: _affine_model(t)),
                                        noisy, ps=64, overlap=32)
    sc_hann = denoise_tiled_hann(_wrap(lambda t: _affine_model(t)), noisy,
                                 ps=64, overlap=32)
    np.testing.assert_allclose(sc_pyr, base_pyr, atol=1e-6)
    assert abs(l1a - l1b) < 1e-6
    np.testing.assert_allclose(sc_hann, base_hann, atol=1e-6)


def test_runner_factory_coerces_scan_batch_under_mesh(rng):
    """mesh + negative batch would silently run sharded tiles through a
    sequential scan — the factories coerce to batch=0 (ADVICE r2)."""
    from image_denoising_tpu.eval import make_tiled_pyramid_runner
    from image_denoising_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    noisy = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    run = make_tiled_pyramid_runner(_wrap(_affine_model), 96, 96, ps=64,
                                    overlap=32, batch=-4, mesh=mesh)
    out, _ = run(jnp.asarray(noisy))
    expected, _ = denoise_tiled_pyramid(_wrap(_affine_model), noisy,
                                        ps=64, overlap=32)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_scan_tiles_equivalence(rng):
    """batch=-1 (lax.map over tiles) must match the fully-batched path."""
    noisy = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    full, l1a = denoise_tiled_pyramid(_wrap(_affine_model), noisy, ps=64, overlap=32)
    scanned, l1b = denoise_tiled_pyramid(
        _wrap(_affine_model), noisy, ps=64, overlap=32, batch=-1
    )
    np.testing.assert_allclose(full, scanned, atol=1e-6)
    assert abs(l1a - l1b) < 1e-6


def test_on_device_uint8_quantization(rng):
    """Device-fused uint8 output equals host rounding of the f32 output."""
    noisy = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    f32, _ = denoise_tiled_pyramid(_wrap(_affine_model), noisy, ps=64, overlap=32)
    u8f, _ = denoise_tiled_pyramid(_wrap(_affine_model), noisy, ps=64, overlap=32,
                                   out_dtype="uint8_floor")
    u8r, _ = denoise_tiled_pyramid(_wrap(_affine_model), noisy, ps=64, overlap=32,
                                   out_dtype="uint8_round")
    assert u8f.dtype == np.uint8 and u8r.dtype == np.uint8
    np.testing.assert_array_equal(u8f, np.clip(f32 * 255.0, 0, 255).astype(np.uint8))
    np.testing.assert_array_equal(
        u8r, np.clip(f32 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )


def test_hann_uint8_round_mode(rng):
    noisy = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    f32 = denoise_tiled_hann(_wrap(_affine_model), noisy, ps=64, overlap=32)
    u8 = denoise_tiled_hann(_wrap(_affine_model), noisy, ps=64, overlap=32,
                            out_dtype="uint8_round")
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(
        u8[..., 0], np.clip(f32[..., 0] * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )
