"""Shared CLI plumbing: model construction + checkpoint loading + image IO.

The reference CLIs accept ``--log_name`` substring dispatch (train/eval) or an
explicit ``--arch`` (finetune); we support both everywhere. Checkpoints may be
our native ``.ckpt`` msgpack pytrees or reference ``.pth`` files (converted on
the fly through the import shim).

Set ``IDT_COMPILATION_CACHE=1`` to enable JAX's persistent compilation cache
(repo-local ``.jax_cache``); opt-in because some remote-compile TPU backends
do not support executable serialization (observed to stall on this host's
tunneled backend).
"""
from __future__ import annotations

import os
import sys
from typing import Any, Optional

import numpy as np


def enable_compilation_cache() -> None:
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        # the cache is explicitly opt-in (IDT_COMPILATION_CACHE=1): if it
        # can't be enabled, say so instead of silently recompiling everything
        print(f"[compilation-cache] could not enable ({e}); "
              "runs will recompile from scratch", file=sys.stderr)


if os.environ.get("IDT_COMPILATION_CACHE") == "1":
    enable_compilation_cache()

__all__ = [
    "build_network",
    "load_params",
    "save_png",
    "MetricsWriter",
    "jitted_apply",
    "batched_frame_forward",
    "add_blindspot_flag",
    "add_dtype_flag",
    "resolve_dtype",
    "iter_bursts",
    "make_clean_post",
    "drain_burst",
]


def iter_bursts(by_shape, get_frame, fb, make_runner, extra=(), post=None,
                max_inflight=3):
    """Shared lazy burst stream for the --frame_burst CLI pipelines.

    One runner per frame-shape bucket; frames are loaded per chunk via
    ``get_frame(j)`` (2-D uint8), the tail chunk is padded by repeating its
    last frame, and at most ``max_inflight`` bursts are in flight so host
    work on drained frames (PNG/metrics) overlaps device compute on later
    bursts while peak RAM stays bounded. Yields ``(chunk, runner_out,
    post_out)`` where ``post(chunk, runner_out)`` (optional) dispatches extra
    device work against the still-device-resident outputs (e.g. the
    --device_metrics scoring program).

    by_shape: {(h, w): [frame indices]} — callers bucket (and validate)
    shapes up front. make_runner(h, w) builds the per-shape jitted runner;
    ``extra`` threads runtime args (params, banks) into each runner call.
    """
    import jax.numpy as jnp

    for (h, w), idxs in sorted(by_shape.items()):
        runner = make_runner(h, w)
        inflight = []
        for s in range(0, len(idxs), fb):
            chunk = idxs[s : s + fb]
            batchf = np.stack([get_frame(j) for j in chunk])
            if len(chunk) < fb:  # pad tail by repeating the last frame
                batchf = np.concatenate(
                    [batchf, np.repeat(batchf[-1:], fb - len(chunk), 0)]
                )
            out = runner(jnp.asarray(batchf), *extra)
            inflight.append((chunk, out, post(chunk, out) if post else None))
            if len(inflight) >= max_inflight:
                yield inflight.pop(0)
        while inflight:
            yield inflight.pop(0)


def make_clean_post(get_clean, fb, metrics_fn, pick_pred=lambda out: out):
    """Build the ``--device_metrics`` ``post()`` for :func:`iter_bursts`.

    Stacks the chunk's clean frames via ``get_clean(j)`` (2-D uint8), pads
    the tail chunk by repeating its last frame — the SAME padding rule
    ``iter_bursts`` applies to the noisy batch, kept in one place so the
    two stacks can never diverge — and scores the still-device-resident
    predictions with ``metrics_fn``. ``pick_pred`` selects the prediction
    array from the runner output (e.g. ``out[0]`` when the runner also
    returns per-frame L1)."""
    import jax.numpy as jnp

    def post(chunk, out):
        cleanf = np.stack([get_clean(j) for j in chunk])
        if len(chunk) < fb:
            cleanf = np.concatenate(
                [cleanf, np.repeat(cleanf[-1:], fb - len(chunk), 0)]
            )
        return metrics_fn(pick_pred(out), jnp.asarray(cleanf))

    return post


def drain_burst(item, cache, fetch_pred=True, pick=lambda out: (out, ())):
    """Fetch one in-flight burst from :func:`iter_bursts` to a host cache.

    ``pick(runner_out) -> (pred_dev, extras_dev)`` splits the runner output
    into the prediction batch and any per-frame extras (e.g. L1 scalars).
    Cache entries are ``(pred_or_None, *extras_j, device_metrics_or_None)``;
    with ``fetch_pred=False`` (``--device_metrics --save_images none``) the
    prediction batch is never fetched — the per-frame D2H is scalars only.
    Returns the drained ``chunk`` (frame indices) so callers can attribute
    wall-clock to bursts (``--timing_json``).
    """
    chunk, out, m_dev = item
    pred_dev, extras_dev = pick(out)
    pred = np.asarray(pred_dev) if fetch_pred else None
    extras = tuple(np.asarray(e) for e in extras_dev)
    m = tuple(np.asarray(x) for x in m_dev) if m_dev is not None else None
    for k, j in enumerate(chunk):
        p = pred[k] if pred is not None else None
        dm = tuple(x[k] for x in m) if m is not None else None
        cache[j] = (p, *(e[k] for e in extras), dm)
    return chunk


def add_blindspot_flag(parser) -> None:
    """--blindspot: 4-rotation blindspot UNet/RESNET with the explicit --arch
    path (the log_name 'blindspot' substring dispatch needs no flag)."""
    parser.add_argument(
        "--blindspot", action="store_true",
        help="build the blindspot variant (4-rotation stack, shifted "
             "convs/pools) when --arch is given; with log_name dispatch "
             "use a 'blindspot' substring instead (reference "
             "train.py:298-302)",
    )


def add_dtype_flag(parser, default: str = "float32") -> None:
    """--dtype: compute dtype for the model (params always stay float32)."""
    parser.add_argument(
        "--dtype", type=str, default=default,
        choices=["float32", "bfloat16"],
        help="compute dtype: bfloat16 engages the MXU's native precision "
             "(+20-40%% throughput; agrees with float32 within 49 dB / "
             "<=4 uint8 levels — see docs/PERF.md). Params stay float32.",
    )


def resolve_dtype(name: Optional[str]):
    """'bfloat16' → jnp.bfloat16; 'float32'/None → None (f32 compute)."""
    if name == "bfloat16":
        import jax.numpy as jnp

        return jnp.bfloat16
    return None


def build_network(
    arch: Optional[str],
    log_name: Optional[str],
    n_channel: int,
    n_feature: int,
    dtype=None,
    remat: bool = False,
    remat_depth: Optional[int] = None,
    blindspot: bool = False,
):
    """Explicit --arch wins; otherwise reference log_name substring dispatch.

    ``blindspot`` applies to the explicit --arch path (UNet/RESNET); the
    log_name path carries it through the reference's ``blindspot`` substring
    dispatch (train.py:298-302) on its own.
    """
    from ..models.registry import build_model, build_model_from_log_name

    if arch:
        return build_model(arch, n_channel, n_feature, dtype=dtype,
                           remat=remat, remat_depth=remat_depth,
                           blindspot=blindspot)
    if log_name:
        return build_model_from_log_name(log_name, n_channel, n_feature,
                                         dtype=dtype, remat=remat,
                                         remat_depth=remat_depth)
    raise ValueError("need --arch or --log_name to select an architecture")


def _arch_name(model) -> str:
    from ..models import ImprovedUNet, RESNET, UNet

    if isinstance(model, ImprovedUNet):
        return "UNetImproved"
    if isinstance(model, RESNET):
        return "RESNET"
    if isinstance(model, UNet):
        return "UNet"
    raise TypeError(type(model))


def load_params(ckpt_path: str, model) -> Any:
    """Load .ckpt or reference .pth base-model weights for ``model``."""
    from ..ckpt import load_checkpoint

    return load_checkpoint(ckpt_path, arch=_arch_name(model))


def jitted_apply(model, params):
    """Closure: x(NHWC float01) → y, jitted with params captured as constants
    donated-free (recompiles only per input shape)."""
    import jax

    @jax.jit
    def fwd(x):
        return model.apply({"params": params}, x)

    return fwd


def batched_frame_forward(fwd, params, frames, parallel: bool = False):
    """Whole-frame inference over a list of [H,W,C] float01 frames.

    ``fwd(params, batch)`` is the jitted batched forward. ``parallel=True``
    is the --parallel wiring the reference implements with nn.DataParallel
    (evaluation_adapter.py:114-115): frames of identical shape are grouped
    into device-count batches sharded over the mesh (params replicated);
    ragged tails are padded by repeating the last frame and cropped after.
    Sequential (parallel=False) runs batch-1 frames like the reference's
    single-GPU path. Returns per-frame [H,W,C] float32 predictions in input
    order.
    """
    import jax
    import jax.numpy as jnp

    mesh = None
    group = 1
    if parallel:
        from ..parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh()
        group = int(mesh.devices.size)
        params = replicate(mesh, params)
        print(f"frame-parallel inference over {group} devices")

    by_shape: dict = {}
    for i, f in enumerate(frames):
        by_shape.setdefault(np.shape(f), []).append(i)

    preds = [None] * len(frames)
    for _, idxs in sorted(by_shape.items()):
        for s in range(0, len(idxs), group):
            chunk = idxs[s : s + group]
            batch = np.stack([np.asarray(frames[i], np.float32) for i in chunk])
            n_real = batch.shape[0]
            if mesh is not None:
                if n_real < group:  # pad tail by repeating the last frame
                    batch = np.concatenate(
                        [batch, np.repeat(batch[-1:], group - n_real, axis=0)]
                    )
                batch = shard_batch(mesh, batch)
            else:
                batch = jnp.asarray(batch)
            out = np.asarray(fwd(params, batch))[:n_real]
            for j, i in enumerate(chunk):
                preds[i] = out[j]
    return preds


def save_png(arr: np.ndarray, path: str, mode: str = "RGB") -> None:
    """uint8 array → PNG with PIL convert semantics (reference saves RGB/L).

    compress_level=1: lossless either way (pixels identical to the default
    level 6), ~2-3× faster to encode — on this 1-core host PNG encoding is
    a measurable slice of eval wall time (docs/PERF.md §9).
    """
    from PIL import Image

    img = Image.fromarray(arr)
    if mode:
        img = img.convert(mode)
    img.save(path, compress_level=1)


def add_host_workers_flag(parser) -> None:
    parser.add_argument(
        "--host_workers", type=int, default=0,
        help="thread-pool size for the per-frame host pass (PSNR/SSIM/IoU + "
             "PNG encode). The native SSIM and PIL's PNG encoder release "
             "the GIL, so frames score in parallel on a multi-core host "
             "while the main thread keeps the device fed (docs/PERF.md §9). "
             "Results finalize in frame order — output is identical to the "
             "default inline pass (0). -1 = one worker per host CPU.",
    )


class HostWorkPool:
    """Optional thread pool for the eval CLIs' per-frame host pass.

    Full eval runs are host-bound once the device pipeline saturates
    (docs/PERF.md §9: SSIM + PNG encode ≈ 85 % of wall time on a 1-core
    box). Both hot host ops release the GIL — the native SSIM is a ctypes
    call into native/ssim.cpp and PIL's PNG encoder drops it during zlib
    compression — so with ``workers > 0`` the per-frame pass runs in a
    ThreadPoolExecutor while the main thread drains device bursts.

    ``submit(fn, *args)`` enqueues one frame's host work; ``finalize(result)``
    is invoked **in submission order** on the main thread (inside submit/
    close), so stdout lines, ``MetricsWriter`` contents and metrics.txt are
    byte-identical to the inline path. The pending window is bounded
    (2·workers+2) so peak RAM holds only a few frames. ``workers=0``
    degrades to calling ``fn`` inline — the zero-overhead default.
    """

    def __init__(self, workers: int, finalize=None):
        self.finalize = finalize if finalize is not None else (lambda r: None)
        self._pool = None
        if workers and workers < 0:  # -1 = one worker per host CPU
            workers = os.cpu_count() or 1
        if workers and workers > 0:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=workers)
            self._pending = deque()
            self._bound = 2 * workers + 2

    def submit(self, fn, *args):
        if self._pool is None:
            self.finalize(fn(*args))
            return
        self._pending.append(self._pool.submit(fn, *args))
        # finalize every already-finished leading frame (order-preserving,
        # non-blocking); block on the oldest only when the window is full
        while self._pending and (
            self._pending[0].done() or len(self._pending) > self._bound
        ):
            self.finalize(self._pending.popleft().result())

    def close(self):
        """Drain remaining frames (in order) and shut the pool down."""
        if self._pool is None:
            return
        try:
            while self._pending:
                self.finalize(self._pending.popleft().result())
        finally:
            self._pool.shutdown(wait=True)
            self._pool = None

    def abort(self):
        """Shut down without finalizing: cancel queued frames, wait for the
        in-flight ones, swallow their results. Used on the error path so a
        failing CLI doesn't keep writing PNGs behind the traceback (or leak
        pool threads to the interpreter's atexit drain)."""
        if self._pool is None:
            return
        self._pending.clear()
        self._pool.shutdown(wait=True, cancel_futures=True)
        self._pool = None

    # Context manager: `with HostWorkPool(...) as pool:` drains + closes on
    # success and aborts on failure — every CLI wraps its frame loop in this.
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.close()
        else:
            self.abort()
        return False


def make_metrics_finalize(writer, skip_none: bool = False):
    """Shared HostWorkPool finalize for the eval CLIs: each frame's host
    pass returns ``(msg, writer_kwargs)``; finalize (main thread, frame
    order) records the metrics and prints the progress line. ``skip_none``
    ignores frames with no ground truth (adapter eval)."""

    def _finalize(res):
        if res is None:
            if skip_none:
                return
            raise ValueError("host pass returned None")
        msg, add_kw = res
        writer.add(**add_kw)
        print(msg)

    return _finalize


class MetricsWriter:
    """Accumulates per-image metrics and writes the reference metrics.txt."""

    def __init__(self):
        self.psnr, self.ssim, self.l1 = [], [], []
        self.iou_dark, self.iou_mid, self.iou_bright = [], [], []

    def add(self, psnr=None, ssim=None, l1=None, ious=None):
        if psnr is not None:
            self.psnr.append(psnr)
        if ssim is not None:
            self.ssim.append(ssim)
        if l1 is not None:
            self.l1.append(l1)
        if ious is not None:
            self.iou_dark.append(ious[0])
            self.iou_mid.append(ious[1])
            self.iou_bright.append(ious[2])

    def averages(self):
        out = {}
        if self.psnr:
            out["psnr"] = float(np.mean(self.psnr))
        if self.ssim:
            out["ssim"] = float(np.mean(self.ssim))
        if self.l1:
            out["l1"] = float(np.mean(self.l1))
        if self.iou_dark:
            out["iou_dark"] = float(np.nanmean(self.iou_dark))
            out["iou_mid"] = float(np.nanmean(self.iou_mid))
            out["iou_bright"] = float(np.nanmean(self.iou_bright))
        return out

    def write(self, save_dir: str) -> str:
        avg = self.averages()
        path = os.path.join(save_dir, "metrics.txt")
        with open(path, "w") as f:
            if "psnr" in avg:
                f.write(f"Average PSNR: {avg['psnr']:.2f}\n")
            if "ssim" in avg:
                f.write(f"Average SSIM: {avg['ssim']:.4f}\n")
            if "l1" in avg:
                f.write(f"Average L1 Loss: {avg['l1']:.6f}\n")
            if "iou_dark" in avg:
                f.write(
                    "Average 3-class IoU (dark/mid/bright): "
                    f"{avg['iou_dark']:.4f}, {avg['iou_mid']:.4f}, {avg['iou_bright']:.4f}\n"
                )
        print(f"Saved metrics to {path}")
        return path
