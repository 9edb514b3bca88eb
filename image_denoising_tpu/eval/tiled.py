"""Batched tiled full-frame inference with on-device window blending.

The reference drives tiling from Python — one host↔device round trip per tile
(``evaluation_704.py:82-112``, ``evaluation_704_iqsl_memory.py:1015-1067``) —
its single biggest inference inefficiency. Here the tile grid is computed
host-side (static per frame geometry), all tiles are gathered into one batch,
the network runs once, and the weighted blend is a fused on-device
scatter-add. One jitted call per frame size; XLA caches recompilations.

Two blending regimes, matching the two reference evaluators:

* pyramid — 352-tile, stride = ps − overlap, grid anchored at multiples of the
  stride (tiles may overrun the frame; they are cropped and reflect-padded),
  weight (1−|2y−1|)(1−|2x−1|) evaluated on the *unpadded* tile extent,
  contribution==0 → 1 divide guard, uint8 via clip(p·255) with NO +0.5.
* hann — 128-tile edge-aligned dedup grid (last tile snapped to the frame
  edge), Hann²(periodic=False) window clamped to ≥1e-3, divide by (w+1e-8),
  uint8 via clip(p·255 + 0.5).

Reference quirk preserved-by-documentation: numpy reflect padding cannot
extend past size−1, so the reference crashes when an edge tile is smaller than
overlap+1 px; we mirror-extend cyclically in that regime instead of crashing
(affects only geometries the reference cannot run at all).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pyramid_weight_mask",
    "hann_window_2d",
    "reference_tile_grid",
    "edge_aligned_grid",
    "denoise_whole_frame",
    "denoise_tiled_pyramid",
    "denoise_tiled_hann",
    "make_tiled_pyramid_runner",
    "make_tiled_pyramid_runner_frames",
    "make_tiled_hann_runner",
    "make_tiled_hann_runner_frames",
]


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------


def pyramid_weight_mask(ps: int) -> np.ndarray:
    """(1 − |2y−1|)(1 − |2x−1|) on a [0,1]-linspace grid (evaluation_704.py:62-68)."""
    yy, xx = np.meshgrid(
        np.linspace(0, 1, ps), np.linspace(0, 1, ps), indexing="ij"
    )
    return ((1 - np.abs(yy - 0.5) * 2) * (1 - np.abs(xx - 0.5) * 2)).astype(np.float32)


def hann_window_2d(ps: int, clamp_min: float = 1e-3) -> np.ndarray:
    """torch.hann_window(ps, periodic=False) outer product, clamped ≥ clamp_min."""
    n = np.arange(ps, dtype=np.float64)
    w1 = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / (ps - 1)))
    w2 = np.outer(w1, w1)
    return np.maximum(w2, clamp_min).astype(np.float32)


# ---------------------------------------------------------------------------
# grids
# ---------------------------------------------------------------------------


def reference_tile_grid(h: int, w: int, ps: int, stride: int):
    """(r0, c0, th, tw) tuples for the stride-anchored, crop-overrun grid."""
    grid = []
    for r0 in range(0, h, stride):
        for c0 in range(0, w, stride):
            th = min(r0 + ps, h) - r0
            tw = min(c0 + ps, w) - c0
            grid.append((r0, c0, th, tw))
    return grid


def edge_aligned_grid(h: int, w: int, ps: int, overlap: int):
    """(r0, c0) full-size tiles with a snapped last row/col, deduped+sorted
    (evaluation_704_iqsl_memory.py:1041-1048)."""
    assert h >= ps and w >= ps, f"Image ({h},{w}) smaller than patch_size {ps}"
    assert overlap < ps, "overlap must be smaller than patch_size"
    step = ps - overlap
    ys = list(range(0, max(h - ps, 0) + 1, step))
    xs = list(range(0, max(w - ps, 0) + 1, step))
    if ys[-1] != h - ps:
        ys.append(h - ps)
    if xs[-1] != w - ps:
        xs.append(w - ps)
    ys = sorted(set(int(y) for y in ys))
    xs = sorted(set(int(x) for x in xs))
    return [(y, x) for y in ys for x in xs]


def _reflect_indices(start: int, valid: int, ps: int) -> np.ndarray:
    """Absolute image indices for a ps-long axis slice starting at ``start``
    with ``valid`` in-bounds pixels, reflect-extended (REFLECT, edge excluded)
    like np.pad(mode='reflect') on the cropped tile."""
    idx = np.arange(ps)
    out = np.empty(ps, dtype=np.int64)
    inb = idx < valid
    out[inb] = start + idx[inb]
    if valid < ps:
        # reflect cycle of length 2·(valid−1): [0..v-1, v-2..1] repeating
        cycle = max(2 * (valid - 1), 1)
        over = idx[~inb] % cycle
        refl = np.where(over < valid, over, cycle - over)
        out[~inb] = start + refl
    return out


# ---------------------------------------------------------------------------
# engines
# ---------------------------------------------------------------------------


def _chunked_forward(model_call, tiles, batch: int, extra=()):
    """Run [T,ps,ps,C] through model_call in fixed-size chunks (pad last).

    ``extra`` is threaded through to model_call (e.g. params, memory banks) so
    they stay runtime arguments instead of baked compile-time constants.

    batch == -k (k ≥ 1) selects ``lax.map`` over chunks of k tiles: the
    network body is compiled ONCE at batch k and looped — a large compile-time
    win on slow-compile backends (the body program is independent of the tile
    count). k = 1 scans tile-by-tile; larger k trades VMEM for per-iteration
    launch overhead. The tile stack is zero-padded to a multiple of k and
    cropped after."""
    t = tiles.shape[0]
    if batch <= -1:
        k = -batch
        if k >= t:
            return model_call(tiles, *extra)
        pad = (-t) % k
        if pad:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad,) + tiles.shape[1:], tiles.dtype)]
            )
        chunks = tiles.reshape(tiles.shape[0] // k, k, *tiles.shape[1:])
        out = jax.lax.map(lambda c: model_call(c, *extra), chunks)
        return out.reshape(out.shape[0] * k, *out.shape[2:])[:t]
    if batch <= 0 or batch >= t:
        return model_call(tiles, *extra)
    outs = []
    for s in range(0, t, batch):
        chunk = tiles[s : s + batch]
        if chunk.shape[0] < batch:  # pad to keep one compiled shape
            pad = batch - chunk.shape[0]
            chunk = jnp.concatenate([chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            outs.append(model_call(chunk, *extra)[: tiles.shape[0] - s])
        else:
            outs.append(model_call(chunk, *extra))
    return jnp.concatenate(outs, axis=0)


def _coerce_batch(batch: int, mesh) -> int:
    """mesh + negative batch is a silent perf foot-gun: a lax.map tile scan is
    sequential, so sharding-constrained tiles would gain nothing. All runner
    factories coerce to batch=0 (one sharded forward) so every caller — CLI or
    direct library use — gets the enforced behavior."""
    if mesh is not None and batch < 0:
        return 0
    return batch


# Cache of fully-jitted per-frame programs keyed on (engine, model_call id,
# geometry). Keeps eager dispatch off the hot path — essential when the TPU
# sits behind a high-latency transport where every eager op is a round trip.
_RUNNER_CACHE: dict = {}


def denoise_whole_frame(model_call, noisy01: np.ndarray):
    """Single full-frame forward (evaluation.py semantics). noisy01: [H,W,C] in [0,1]."""
    x = jnp.asarray(noisy01)[None]
    pred = model_call(x)[0]
    return np.asarray(jnp.clip(pred, 0.0, 1.0))


# Above this tile count the unrolled pad-and-add blend (O(tiles) HLO ops)
# switches to an O(1)-program-size scatter fori_loop: a 4096² Hann grid is
# ~4k tiles, and thousands of unrolled ops per blend can make compilation
# impractical on a minutes-per-compile backend. Small grids (the documented
# 704² workloads are 9–100 tiles) keep the unrolled form, which XLA fuses
# into a handful of kernels where the scatter loop serializes (~14 ms/frame
# of pure scatter on v5e, docs/PERF.md §4).
_UNROLL_MAX_TILES = 256


def _scatter_blend(r0s, c0s, window, h: int, w: int, ps: int, inv_contrib,
                   clip01: bool, valid_hw=None):
    """O(1)-program-size blend: fori_loop of dynamic-slice adds on a canvas
    padded by ps (pyramid grids may overrun the frame edge; the weight masks
    are zero outside the valid extent so the overrun adds zeros).

    ``window`` is ONE shared [ps,ps] mask. Ragged pyramid edge tiles pass
    ``valid_hw`` = ([T] th, [T] tw): a cropped tile's mask is exactly the
    shared mask's top-left th×tw block, so validity is applied as two iota
    comparisons instead of baking a [T,ps,ps] per-tile mask stack (~160 MB
    for a 5000² pyramid grid — the huge-frame regime this fallback exists
    for)."""
    r0j = jnp.asarray(r0s, jnp.int32)
    c0j = jnp.asarray(c0s, jnp.int32)
    wmj = jnp.asarray(window, jnp.float32)
    if valid_hw is not None:
        th_j = jnp.asarray(valid_hw[0], jnp.int32)
        tw_j = jnp.asarray(valid_hw[1], jnp.int32)
        iota = jnp.arange(ps, dtype=jnp.int32)

    def blend(preds):
        canvas = jnp.zeros((h + ps, w + ps), jnp.float32)

        def body(i, canvas):
            p = preds[i].astype(jnp.float32)
            if clip01:
                p = jnp.clip(p, 0.0, 1.0)
            tile = p * wmj
            if valid_hw is not None:
                tile = tile * (iota < th_j[i])[:, None] * (iota < tw_j[i])[None, :]
            cur = jax.lax.dynamic_slice(canvas, (r0j[i], c0j[i]), (ps, ps))
            return jax.lax.dynamic_update_slice(canvas, cur + tile, (r0j[i], c0j[i]))

        canvas = jax.lax.fori_loop(0, len(r0s), body, canvas)
        return canvas[:h, :w] * inv_contrib

    return blend


def _make_pyramid_blender(grid, mask_np: np.ndarray, h: int, w: int):
    """Build preds[T,ps,ps] → [h,w] pyramid blend for a STATIC tile grid.

    The tile grid is static per frame geometry, so the blend unrolls into T
    pad-and-add ops with static offsets — XLA fuses these into a handful of
    kernels, where a scatter-add fori_loop serializes (measured ~14 ms/frame
    of pure scatter on v5e; this form is ~µs). The contribution map is
    input-independent: precomputed host-side and baked as a constant
    reciprocal (multiply beats divide on the VPU). Grids larger than
    _UNROLL_MAX_TILES fall back to the O(1)-program-size scatter loop so huge
    frames stay compilable.
    """
    ps = mask_np.shape[0]
    wms = []
    contrib = np.zeros((h, w), np.float64)
    for (r0, c0, th, tw) in grid:
        wm = mask_np[:th, :tw].astype(np.float32)
        wms.append(jnp.asarray(wm))
        contrib[r0 : r0 + th, c0 : c0 + tw] += wm
    contrib[contrib == 0] = 1.0
    inv_contrib = jnp.asarray(1.0 / contrib, jnp.float32)

    if len(grid) > _UNROLL_MAX_TILES:
        return _scatter_blend(
            [g[0] for g in grid], [g[1] for g in grid], mask_np, h, w, ps,
            inv_contrib, clip01=True,
            valid_hw=([g[2] for g in grid], [g[3] for g in grid]),
        )

    def blend(preds):
        canvas = jnp.zeros((h, w), jnp.float32)
        for i, (r0, c0, th, tw) in enumerate(grid):
            p = jnp.clip(preds[i, :th, :tw].astype(jnp.float32), 0.0, 1.0)
            canvas += jnp.pad(p * wms[i], ((r0, h - r0 - th), (c0, w - c0 - tw)))
        return canvas * inv_contrib

    return blend


def _tile_sharding(mesh):
    """Shard the tile batch axis over the mesh (spatial/context parallelism:
    SURVEY.md §5 — the tile grid is the sequence-length analog)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def _shard_tiles(tiles, mesh):
    """Pad T to a device multiple and constrain the batch-dim sharding; XLA
    then runs each device's tile slice locally (no collective until blend)."""
    n_dev = int(np.prod(mesh.devices.shape))
    t = tiles.shape[0]
    pad = (-t) % n_dev
    if pad:
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((pad,) + tiles.shape[1:], tiles.dtype)], axis=0
        )
    tiles = jax.lax.with_sharding_constraint(tiles, _tile_sharding(mesh))
    return tiles, t


def _quantize(out01, out_dtype: str):
    """On-device uint8 quantization — both reference rounding conventions.

    'uint8_floor' = clip(p·255) without +0.5 (evaluation_704.py:120);
    'uint8_round' = clip(p·255 + 0.5) (evaluation.py:83, memory eval).
    Shipping uint8 instead of f32 cuts the D2H transfer 4×.
    """
    if out_dtype == "float32":
        return out01
    bias = 0.5 if out_dtype == "uint8_round" else 0.0
    return jnp.clip(out01 * 255.0 + bias, 0, 255).astype(jnp.uint8)


def make_tiled_pyramid_runner(
    model_call: Callable, h: int, w: int, ps: int = 352, overlap: int = 64,
    batch: int = 0, *, mesh=None, out_dtype: str = "float32",
):
    """One fully-jitted program: frame [H,W] float255 → (pred, mean tile L1).

    Gather (with reflect edge handling), batched forward, weighting, and the
    scatter-add blend all fuse into a single device program — zero eager ops
    per frame after the first call. Pass ``mesh`` to shard the tile batch over
    devices (huge-frame spatial parallelism). ``out_dtype`` in
    {'float32', 'uint8_floor', 'uint8_round'} — uint8 fuses the quantization
    on device (see _quantize).
    """
    batch = _coerce_batch(batch, mesh)
    stride = ps - overlap
    grid = reference_tile_grid(h, w, ps, stride)
    row_idx = jnp.asarray(
        np.stack([_reflect_indices(r0, th, ps) for (r0, _, th, _) in grid])
    )
    col_idx = jnp.asarray(
        np.stack([_reflect_indices(c0, tw, ps) for (_, c0, _, tw) in grid])
    )
    blend = _make_pyramid_blender(grid, pyramid_weight_mask(ps), h, w)

    @jax.jit
    def run(noisy255, *extra):
        img = noisy255.astype(jnp.float32) / 255.0
        tiles = img[row_idx[:, :, None], col_idx[:, None, :]][..., None]
        n_tiles = tiles.shape[0]
        if mesh is not None:
            tiles, n_tiles = _shard_tiles(tiles, mesh)
        preds = _chunked_forward(model_call, tiles, batch, extra)[..., 0]
        preds = preds[:n_tiles]
        tiles = tiles[:n_tiles]
        l1 = jnp.mean(jnp.abs(preds - tiles[..., 0]), axis=(1, 2)).mean()
        out = blend(preds)
        return _quantize(out, out_dtype), l1

    return run


def make_tiled_pyramid_runner_frames(
    model_call: Callable, n_frames: int, h: int, w: int, ps: int = 352,
    overlap: int = 64, batch: int = 0, *, mesh=None, out_dtype: str = "float32",
):
    """Frame-batched variant: [F,H,W] float255 → ([F,H,W] pred, [F] L1).

    All F·T tiles run as one forward and the blends vmap over frames — one
    device dispatch for a whole burst of frames, amortizing launch/transfer
    latency (the serving-pipeline shape; see bench.py). ``batch=-k`` runs the
    F·T tile stack as a lax.map scan over k-tile chunks (network body
    compiled ONCE — the compile-time fix that makes burst programs viable on
    slow-compile backends; k=8 fills the TPU sublane dim). ``out_dtype`` as
    in make_tiled_pyramid_runner. ``mesh`` shards the flattened F·T tile
    stack over the device mesh (use with batch=0 — a lax.map scan is
    sequential and gains nothing from sharding).
    """
    batch = _coerce_batch(batch, mesh)
    stride = ps - overlap
    grid = reference_tile_grid(h, w, ps, stride)
    row_idx = jnp.asarray(
        np.stack([_reflect_indices(r0, th, ps) for (r0, _, th, _) in grid])
    )
    col_idx = jnp.asarray(
        np.stack([_reflect_indices(c0, tw, ps) for (_, c0, _, tw) in grid])
    )
    blend = _make_pyramid_blender(grid, pyramid_weight_mask(ps), h, w)
    t = len(grid)

    @jax.jit
    def run(frames255, *extra):
        imgs = frames255.astype(jnp.float32) / 255.0  # [F,H,W]
        tiles = imgs[:, row_idx[:, :, None], col_idx[:, None, :]]  # [F,T,ps,ps]
        tiles = tiles.reshape(n_frames * t, ps, ps, 1)
        n_tiles = tiles.shape[0]
        if mesh is not None:
            tiles, n_tiles = _shard_tiles(tiles, mesh)
        preds = _chunked_forward(model_call, tiles, batch, extra)[..., 0]
        preds = preds[:n_tiles]
        tiles = tiles[:n_tiles]
        preds = preds.reshape(n_frames, t, ps, ps)
        tiles = tiles.reshape(n_frames, t, ps, ps)
        l1 = jnp.mean(jnp.abs(preds - tiles), axis=(2, 3)).mean(axis=1)
        out = jax.vmap(blend)(preds)
        return _quantize(out, out_dtype), l1

    return run


def denoise_tiled_pyramid(
    model_call: Callable,
    noisy255: np.ndarray,
    ps: int = 352,
    overlap: int = 64,
    batch: int = 0,
    extra=(),
    out_dtype: str = "float32",
    mesh=None,
):
    """Tiled-352 pyramid-blend full-frame denoise (evaluation_704.py engine).

    noisy255: [H,W] uint8/float in [0,255]. Returns (pred [H,W] — float32 in
    [0,1] or uint8 per ``out_dtype``, mean per-tile L1(pred, padded_input)).
    Jitted programs are cached per (model, geometry); pass changing values
    (params, banks) via ``extra``. ``mesh`` shards the tile batch over the
    device mesh (--parallel in the eval CLIs; ref wiring
    evaluation_adapter.py:114-115) — use with batch=0 (a lax.map tile scan
    is sequential and gains nothing from sharding).
    """
    noisy = np.asarray(noisy255)
    assert noisy.ndim == 2, "tiled pyramid eval is single-channel"
    h, w = noisy.shape
    # key on the COERCED batch so batch=-k + mesh and batch=0 + mesh hit the
    # same cached program instead of compiling the identical geometry twice
    batch = _coerce_batch(batch, mesh)
    key = ("pyr", id(model_call), h, w, ps, overlap, batch, out_dtype, id(mesh))
    run = _RUNNER_CACHE.get(key)
    if run is None:
        run = _RUNNER_CACHE[key] = make_tiled_pyramid_runner(
            model_call, h, w, ps, overlap, batch, mesh=mesh, out_dtype=out_dtype
        )
    out, l1 = run(jnp.asarray(noisy), *extra)
    return np.asarray(out), float(l1)


def _make_hann_blender(grid, window_np: np.ndarray, h: int, w: int, ps: int):
    """Build preds[T,ps,ps] → [h,w] Hann² blend for a STATIC tile grid.

    Same unrolled pad-and-add form as _make_pyramid_blender; the Hann weight
    sum is input-independent and baked as a constant reciprocal (with the
    reference's +1e-8 guard, evaluation_704_iqsl_memory.py:1064)."""
    window = jnp.asarray(window_np.astype(np.float32))
    wsum = np.zeros((h, w), np.float64)
    for (r0, c0) in grid:
        wsum[r0 : r0 + ps, c0 : c0 + ps] += window_np
    inv_wsum = jnp.asarray(1.0 / (wsum + 1e-8), jnp.float32)

    if len(grid) > _UNROLL_MAX_TILES:
        return _scatter_blend(
            [g[0] for g in grid], [g[1] for g in grid],
            window_np.astype(np.float32), h, w, ps,
            inv_wsum, clip01=False,
        )

    def blend(preds):
        canvas = jnp.zeros((h, w), jnp.float32)
        for i, (r0, c0) in enumerate(grid):
            p = preds[i].astype(jnp.float32) * window
            canvas += jnp.pad(p, ((r0, h - r0 - ps), (c0, w - c0 - ps)))
        return canvas * inv_wsum

    return blend


def make_tiled_hann_runner(
    model_call: Callable, h: int, w: int, ps: int = 128, overlap: int = 64,
    batch: int = 0, *, mesh=None, out_dtype: str = "float32",
    pre_tile_fn: Callable | None = None,
):
    """One fully-jitted program: frame [H,W] float255 → pred [H,W].

    ``pre_tile_fn(tiles, *extra) -> tiles'`` runs ONCE on the full [T,ps,ps,C]
    stack before the (possibly chunked) forward — the hoisted-retrieval hook:
    the memory CLIs retrieve all tiles' bank patches in one pass and return
    them concatenated as extra channels, so the per-chunk forward never
    re-sweeps the bank (adapters.batched_select_memory_patch)."""
    batch = _coerce_batch(batch, mesh)
    grid = edge_aligned_grid(h, w, ps, overlap)
    r0s = jnp.asarray([g[0] for g in grid], jnp.int32)
    c0s = jnp.asarray([g[1] for g in grid], jnp.int32)
    blend = _make_hann_blender(grid, hann_window_2d(ps), h, w, ps)

    @jax.jit
    def run(noisy255, *extra):
        img = noisy255.astype(jnp.float32) / 255.0
        yy = jnp.arange(ps)
        tiles = img[(r0s[:, None] + yy)[:, :, None], (c0s[:, None] + yy)[:, None, :]]
        tiles = tiles[..., None]
        if pre_tile_fn is not None:
            tiles = pre_tile_fn(tiles, *extra)
        n_tiles = tiles.shape[0]
        if mesh is not None:
            tiles, n_tiles = _shard_tiles(tiles, mesh)
        preds = _chunked_forward(model_call, tiles, batch, extra)[..., 0]
        preds = preds[:n_tiles]
        out = blend(preds)
        return _quantize(out, out_dtype)

    return run


def make_tiled_hann_runner_frames(
    model_call: Callable, n_frames: int, h: int, w: int, ps: int = 128,
    overlap: int = 64, batch: int = 0, *, mesh=None, out_dtype: str = "float32",
    pre_tile_fn: Callable | None = None,
):
    """Frame-batched Hann variant: [F,H,W] float255 → [F,H,W] pred.

    The memory-engine analog of ``make_tiled_pyramid_runner_frames``
    (reference geometry: evaluation_704_iqsl_memory.py:1015-1067): all F·T
    128-px tiles run as one forward (or one lax.map scan at ``batch=-k``; k=8
    fills the TPU sublane dim) and the Hann² blends vmap over frames — one
    device dispatch per burst so transfers overlap compute, where the
    single-frame runner ships one frame per dispatch. ``extra`` (params,
    banks) threads through to model_call unchanged."""
    batch = _coerce_batch(batch, mesh)
    grid = edge_aligned_grid(h, w, ps, overlap)
    r0s = jnp.asarray([g[0] for g in grid], jnp.int32)
    c0s = jnp.asarray([g[1] for g in grid], jnp.int32)
    blend = _make_hann_blender(grid, hann_window_2d(ps), h, w, ps)
    t = len(grid)

    @jax.jit
    def run(frames255, *extra):
        imgs = frames255.astype(jnp.float32) / 255.0  # [F,H,W]
        yy = jnp.arange(ps)
        tiles = imgs[:, (r0s[:, None] + yy)[:, :, None],
                     (c0s[:, None] + yy)[:, None, :]]  # [F,T,ps,ps]
        tiles = tiles.reshape(n_frames * t, ps, ps, 1)
        if pre_tile_fn is not None:
            tiles = pre_tile_fn(tiles, *extra)
        n_tiles = tiles.shape[0]
        if mesh is not None:
            tiles, n_tiles = _shard_tiles(tiles, mesh)
        preds = _chunked_forward(model_call, tiles, batch, extra)[..., 0]
        preds = preds[:n_tiles].reshape(n_frames, t, ps, ps)
        out = jax.vmap(blend)(preds)
        return _quantize(out, out_dtype)

    return run


def denoise_tiled_hann(
    model_call: Callable,
    noisy255: np.ndarray,
    ps: int = 128,
    overlap: int = 64,
    batch: int = 0,
    extra=(),
    out_dtype: str = "float32",
    mesh=None,
    pre_tile_fn: Callable | None = None,
):
    """Hann²-blended patchwise denoise (denoise_full_image_patchwise engine).

    noisy255: [H,W] (or [H,W,1]) in [0,255]. Returns pred01 [H,W,1] float32 —
    the reference returns (H,W,1) in [0,1]. Jitted programs cached per
    (model, geometry); pass changing values (params, banks) via ``extra``.
    ``mesh`` shards the tile batch over the device mesh (--parallel; use
    with batch=0).
    """
    noisy = np.asarray(noisy255)
    if noisy.ndim == 3 and noisy.shape[2] == 1:
        noisy = noisy[..., 0]
    h, w = noisy.shape
    batch = _coerce_batch(batch, mesh)  # cache on the coerced value (see pyr)
    key = ("hann", id(model_call), h, w, ps, overlap, batch, out_dtype,
           id(mesh), id(pre_tile_fn))
    run = _RUNNER_CACHE.get(key)
    if run is None:
        run = _RUNNER_CACHE[key] = make_tiled_hann_runner(
            model_call, h, w, ps, overlap, batch, mesh=mesh,
            out_dtype=out_dtype, pre_tile_fn=pre_tile_fn,
        )
    return np.asarray(run(jnp.asarray(noisy), *extra))[..., None]
