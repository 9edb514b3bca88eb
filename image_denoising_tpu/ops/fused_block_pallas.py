"""Pallas TPU kernel: VMEM-resident fused conv chain for the ImprovedUNet
level blocks (lead conv → RDB → ResBlock-conv0).

Why (docs/PERF.md §5): the batch-8 XLA program is HBM-bandwidth-bound —
3.52 GB accessed per 352² tile at ~21 FLOP/byte, with the RDB's dense
concats re-reading every growth feature from HBM once per layer and the
32/48-channel activations wasting 60–75 % of each 128-lane tile. This kernel
keeps a spatial slab's ENTIRE chain of activations in VMEM (v5e has 128 MB —
probed: a 120 MB scratch compiles and runs):

* one slab of the input is DMA'd in; the lead conv, all 4 RDB growth convs,
  the 1×1 local-feature-fusion conv, the RDB residual add, and (optionally)
  the ResBlock's first conv run back-to-back with NO intermediate HBM
  traffic; only rdb_out (+ c0_out) leave the core.
* the RDB concat never materializes: growth features are written into one
  shared [M, 48+4·32] VMEM buffer and each growth conv is a single matmul
  over the buffer prefix — the contraction dim GROWS (48→80→112→144→176)
  instead of multiplying 9× im2col copies.
* every 3×3 conv is the 9-tap matmul form: y = x @ W9 with
  W9[c, t·Cout+c'] = W[dy,dx,c,c'] (t = dy·3+dx), then 9 shifted adds.
  N = 9·Cout (288 for growth convs) fills the MXU lane dim where XLA's
  im2col (N = Cout = 32) would idle 3/4 of the columns; K = Cin.

Spatial slabbing + SAME-conv semantics: the host pads the image by ``k``
(chain depth) rows/cols of zeros. Inside the kernel every array keeps the
constant padded shape; a conv consumes one ring of validity and the
out-of-image region is re-zeroed after every conv (mask multiply) so a later
conv's edge outputs see the exact zero padding the full-image SAME conv
would. Slabs overlap by 2k rows (halo); each grid step writes only its
valid interior. Correctness of the halo/mask scheme is pinned by the
interpret-mode parity tests (tests/test_fused_block_pallas.py) against the
flax modules.

Reference semantics being accelerated: ``arch_unet.py:422-472`` (RDB,
ResBlock, the per-level Conv→LReLU→RDB→ResBlock stacks of ImprovedUNet).
Inference-path kernel (no custom VJP): training keeps the XLA forward.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_w9",
    "fused_rdb_chain",
    "FusedChainWeights",
]

LEAKY_SLOPE = 0.2


def pack_w9(w):
    """[3,3,Cin,Cout] (flax HWIO) → [Cin, 9·Cout] with tap t = dy·3+dx."""
    k0, k1, cin, cout = w.shape
    assert k0 == 3 and k1 == 3, w.shape
    return jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, 9 * cout)


class FusedChainWeights:
    """Repacked weights for one level block, pulled from the flax param tree.

    ``prefix`` examples (ImprovedUNet param names, models/improved_unet.py):
      encoder level i: lead='down{i}_conv', rdb='down{i}_rdb', res='down{i}_res'
      bottleneck:      lead=None,          rdb='bottle_rdb', res='bottle_res'
    """

    def __init__(self, params, lead: Optional[str], rdb: str,
                 res: Optional[str] = None, dtype=jnp.float32):
        f = lambda a: jnp.asarray(a, dtype)
        if lead is not None:
            conv = params[lead]["conv"]
            self.lead_w9 = f(pack_w9(conv["kernel"]))
            self.lead_b = f(conv["bias"])
        else:
            self.lead_w9 = None
            self.lead_b = None
        rdb_p = params[rdb]
        self.growth_w9 = [f(pack_w9(rdb_p[f"conv{i}"]["conv"]["kernel"]))
                          for i in range(4)]
        self.growth_b = [f(rdb_p[f"conv{i}"]["conv"]["bias"]) for i in range(4)]
        self.lff_w = f(rdb_p["lff"]["conv"]["kernel"][0, 0])  # [C_cat, nf]
        self.lff_b = f(rdb_p["lff"]["conv"]["bias"])
        if res is not None:
            self.res0_w9 = f(pack_w9(params[res]["conv0"]["conv"]["kernel"]))
        else:
            self.res0_w9 = None


def _mask_slab(arr, row_mask, col_mask):
    """Zero everything outside the true image (SAME-pad invariant)."""
    return arr * (row_mask * col_mask)


def _conv3x3_flat(x_flat, w9, cout, r, w2, ybuf):
    """9-tap conv on a flattened [R·W2, Cin] slab → [R·W2, Cout] (f32).

    ``ybuf`` is a shared scratch ref of shape [(R+2)·W2, ≥9·Cout] whose first
    and last W2 rows are pre-zeroed: the tap matmul lands in its interior so
    the extreme taps' one-past-the-end reads (which only affect border
    COLUMNS — masked to zero by the caller) hit the zero pads in-bounds,
    without materializing a concat copy of the [M, 9·Cout] buffer.
    """
    m = r * w2
    ybuf[w2 : w2 + m, : 9 * cout] = jax.lax.dot_general(
        x_flat, w9, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, 9·Cout]
    m_valid = (r - 2) * w2
    acc = jnp.zeros((m_valid, cout), jnp.float32)
    for t in range(9):
        dy, dx = divmod(t, 3)
        off = dy * w2 + dx - 1 + w2  # static slice offsets (python ints)
        acc = acc + ybuf[off : off + m_valid, t * cout : (t + 1) * cout]
    # pad one W2-row of zeros top and bottom back to constant shape
    zrow = jnp.zeros((w2, cout), jnp.float32)
    return jnp.concatenate([zrow, acc, zrow], axis=0)


def _leaky(x):
    return jnp.maximum(x, LEAKY_SLOPE * x)


def _chain_kernel(
    x_ref, *refs,
    nf: int, cin: int, growth: int, n_growth: int, s_rows: int, k: int,
    w_img: int, h_img: int, w2: int, n_slabs: int, with_lead: bool,
    with_res0: bool, compute_dtype, feats_pad: int,
):
    """Grid (B·n_slabs,). refs = [weights..., out_rdb, out_c0?, feats_scratch].

    x_ref: [1, R, W2, Cin] slab (R = s_rows + 2k; W2 = w_img + 2k rounded up
    to a sublane multiple so the flatten to [R·W2, C] is layout-free), zero
    outside the image. Outputs: [1, s_rows, w_img, nf] interiors.
    """
    n_w = (2 if with_lead else 0) + 2 * n_growth + 2 + (1 if with_res0 else 0)
    w_refs = refs[:n_w]
    out_refs = refs[n_w:-2]
    feats = refs[-2]  # VMEM scratch [M, feats_pad]
    ybuf = refs[-1]   # VMEM scratch [(R+2)·W2, n9_max] for the tap matmuls

    s = jax.lax.rem(pl.program_id(0), n_slabs)  # slab index within the sample
    r = s_rows + 2 * k
    m = r * w2

    # in-image masks for the constant-shape slab, as [M, 1] multiplicands.
    # col: k ≤ w < k + w_img; row: 0 ≤ (s·s_rows − k + row) < h_img.
    flat_i = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    row_i = flat_i // w2
    col_i = flat_i - row_i * w2
    col_ok = (col_i >= k) & (col_i < k + w_img)
    img_row = s * s_rows - k + row_i
    row_ok = (img_row >= 0) & (img_row < h_img)
    mask = (col_ok & row_ok).astype(compute_dtype)

    wi = 0

    def next_w():
        nonlocal wi
        ref = w_refs[wi]
        wi += 1
        return ref

    # pre-zero the tap buffer's one-row pads (see _conv3x3_flat)
    ybuf[:w2, :] = jnp.zeros((w2, ybuf.shape[1]), jnp.float32)
    ybuf[w2 + m :, :] = jnp.zeros((w2, ybuf.shape[1]), jnp.float32)

    x = x_ref[0].reshape(m, cin).astype(compute_dtype)  # layout-free: w2 % 8 == 0

    if with_lead:
        lead_w9 = next_w()
        lead_b = next_w()
        h = _conv3x3_flat(x, lead_w9[:], nf, r, w2, ybuf)
        h = _leaky(h + lead_b[:]).astype(compute_dtype) * mask
    else:
        h = x  # cin == nf
    feats[:, :nf] = h

    width = nf
    for i in range(n_growth):
        g_w9 = next_w()
        g_b = next_w()
        g = _conv3x3_flat(feats[:, :width], g_w9[:], growth, r, w2, ybuf)
        g = _leaky(g + g_b[:]).astype(compute_dtype) * mask
        feats[:, width : width + growth] = g
        width += growth

    lff_w = next_w()
    lff_b = next_w()
    lff = jax.lax.dot_general(
        feats[:, :width], lff_w[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + lff_b[:]
    rdb_out = ((feats[:, :nf] + lff.astype(compute_dtype)) * mask).astype(
        compute_dtype
    )

    # write the valid interior: rows k..k+s_rows, cols k..k+w_img
    def interior(a):
        a3 = a.reshape(r, w2, nf)
        return a3[k : k + s_rows, k : k + w_img, :]

    out_refs[0][0] = interior(rdb_out).astype(out_refs[0].dtype)

    if with_res0:
        res0_w9 = next_w()
        c0 = _conv3x3_flat(rdb_out, res0_w9[:], nf, r, w2, ybuf)
        c0 = (c0.astype(compute_dtype) * mask)
        out_refs[1][0] = interior(c0).astype(out_refs[1].dtype)


_VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def _auto_slab_rows(h_img, w_img, k, feats_pad, growth, nf, compute_dtype,
                    budget=_VMEM_BUDGET_BYTES):
    """Largest divisor of H whose slab working set fits the VMEM budget.

    Plain halving can step through non-divisors (H=900 → 225 → 112 …) and
    trip the divisibility assert; restricting to divisors keeps auto-selection
    valid for any height. Falls back to 1-row slabs if nothing fits.
    """
    def _fits(sr):
        r = sr + 2 * k
        w2 = w_img + 2 * k
        bytes_est = (
            r * w2 * (feats_pad + 9 * max(growth, nf) * 2 + 3 * 128)
            * np.dtype(compute_dtype).itemsize
        )
        return bytes_est < budget

    divisors = [d for d in range(h_img, 0, -1) if h_img % d == 0]
    return next((d for d in divisors if _fits(d)), divisors[-1])


def fused_rdb_chain(
    x,
    weights: FusedChainWeights,
    *,
    growth: int = 32,
    n_growth: int = 4,
    s_rows: Optional[int] = None,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """lead conv→LReLU (optional) → RDB (dense growth convs + LFF + residual)
    → optional ResBlock-conv0, one VMEM-resident chain per spatial slab.

    x: [B, H, W, Cin] (Cin = nf when no lead conv). Returns rdb_out
    [B, H, W, nf] or (rdb_out, c0_out) when the chain includes res conv0.
    ``s_rows``: slab height (must divide H); default = whole image if the
    working set fits ~96 MB of VMEM, else halved until it does.
    """
    b, h_img, w_img, cin = x.shape
    with_lead = weights.lead_w9 is not None
    with_res0 = weights.res0_w9 is not None
    nf = (weights.lff_w.shape[1])
    # chain depth in 3×3 convs = halo k
    k = (1 if with_lead else 0) + n_growth + (1 if with_res0 else 0)
    feats_width = nf + n_growth * growth
    feats_pad = -(-feats_width // 128) * 128

    if s_rows is None:
        s_rows = _auto_slab_rows(h_img, w_img, k, feats_pad, growth, nf,
                                 compute_dtype)
    assert h_img % s_rows == 0, (h_img, s_rows)
    n_slabs = h_img // s_rows
    r = s_rows + 2 * k
    # pad W2 up to a sublane (8) multiple so the in-kernel [R,W2,C]→[R·W2,C]
    # flatten is layout-free; the extra right columns are zeros outside the
    # image and stay zero under the mask invariant.
    w2 = -(-(w_img + 2 * k) // 8) * 8

    xp = jnp.pad(
        x, ((0, 0), (k, k), (k, w2 - w_img - k), (0, 0))
    ).astype(compute_dtype)

    w_list, w_specs = [], []

    def add_w(a):
        w_list.append(a)
        w_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    if with_lead:
        add_w(weights.lead_w9)
        add_w(weights.lead_b.reshape(1, -1))
    for i in range(n_growth):
        add_w(weights.growth_w9[i])
        add_w(weights.growth_b[i].reshape(1, -1))
    add_w(weights.lff_w)
    add_w(weights.lff_b.reshape(1, -1))
    if with_res0:
        add_w(weights.res0_w9)

    n_steps = b * n_slabs
    out_shapes = [jax.ShapeDtypeStruct((n_steps, s_rows, w_img, nf), x.dtype)]
    out_specs = [
        pl.BlockSpec((1, s_rows, w_img, nf), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if with_res0:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_steps, s_rows, w_img, nf), x.dtype)
        )
        out_specs.append(
            pl.BlockSpec((1, s_rows, w_img, nf), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _chain_kernel,
        nf=nf, cin=cin, growth=growth, n_growth=n_growth, s_rows=s_rows,
        k=k, w_img=w_img, h_img=h_img, w2=w2, n_slabs=n_slabs,
        with_lead=with_lead, with_res0=with_res0,
        compute_dtype=compute_dtype, feats_pad=feats_pad,
    )

    # Input slabs overlap by 2k rows — not expressible as disjoint BlockSpec
    # blocks, so overlapping slabs are gathered host-side (one cheap XLA
    # gather) into [B·n_slabs, R, W2, Cin] and the grid is 1-D over them.
    slab_starts = np.arange(n_slabs) * s_rows  # in padded coords, top of halo
    x_slabs = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, int(st), r, axis=1)
         for st in slab_starts], axis=1,
    ).reshape(b * n_slabs, r, w2, cin)

    outs = pl.pallas_call(
        kernel,
        grid=(b * n_slabs,),
        in_specs=[
            pl.BlockSpec((1, r, w2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shapes) if len(out_shapes) > 1 else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((r * w2, feats_pad), compute_dtype),
            # shared tap-matmul buffer: one zero row of pad each side
            pltpu.VMEM(
                ((r + 2) * w2, -(-9 * max(nf, growth) // 128) * 128),
                jnp.float32,
            ),
        ],
        # XLA's default scoped-vmem cap is 16 MB; the whole point of this
        # kernel is VMEM residency. v5e has 128 MB physical VMEM (probed:
        # a 120 MB scratch compiles and runs on this chip).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_slabs, *w_list)

    def unstack(o):
        return o.reshape(b, n_slabs * s_rows, w_img, nf)

    if with_res0:
        return unstack(outs[0]), unstack(outs[1])
    return unstack(outs)
