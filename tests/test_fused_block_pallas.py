"""Interpret-mode parity tests for the VMEM-resident fused conv chain
(ops/fused_block_pallas.py) and the fused ImprovedUNet forward
(models/fused_forward.py) against the flax modules.

Pallas TPU kernels have no CPU lowering — these run the kernels in
interpreter mode, which checks the math (tap offsets, halo/mask scheme,
dense-feature buffer) but not the Mosaic lowering; the hardware compile is
exercised by tests/tpu/run_tpu_checks.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from image_denoising_tpu.models import ImprovedUNet
from image_denoising_tpu.models.improved_unet import RDB
from image_denoising_tpu.models.layers import Conv, leaky_relu
from image_denoising_tpu.ops.fused_block_pallas import (
    FusedChainWeights,
    fused_rdb_chain,
    pack_w9,
)


class _LevelHead(nn.Module):
    """lead conv → LReLU → RDB → ResBlock-conv0 (the fused chain's scope)."""

    nf: int

    @nn.compact
    def __call__(self, x):
        x = leaky_relu(Conv(self.nf, init="torch", name="down0_conv")(x))
        x = RDB(self.nf, name="down0_rdb")(x)
        c0 = Conv(self.nf, use_bias=False, init="torch", name="res_c0")(x)
        return x, c0


def _head_setup(rng, nf=16, h=16, w=24, cin=2):
    m = _LevelHead(nf=nf)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    ref_rdb, ref_c0 = m.apply({"params": params}, x)
    p2 = dict(params)
    p2["res_fake"] = {"conv0": {"conv": {"kernel": params["res_c0"]["conv"]["kernel"]}}}
    wts = FusedChainWeights(p2, lead="down0_conv", rdb="down0_rdb", res="res_fake")
    return x, wts, np.asarray(ref_rdb), np.asarray(ref_c0)


@pytest.mark.parametrize("s_rows", [None, 8, 4])
def test_fused_chain_matches_flax(rng, s_rows):
    x, wts, ref_rdb, ref_c0 = _head_setup(rng)
    out_rdb, out_c0 = fused_rdb_chain(x, wts, s_rows=s_rows, interpret=True)
    np.testing.assert_allclose(np.asarray(out_rdb), ref_rdb, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_c0), ref_c0, atol=2e-6)


def test_fused_chain_bottleneck_no_lead(rng):
    """lead=None (bottleneck form): input channels == nf, no entry conv."""
    class Bottle(nn.Module):
        nf: int

        @nn.compact
        def __call__(self, x):
            return RDB(self.nf, name="bottle_rdb")(x)

    nf = 16
    m = Bottle(nf=nf)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, nf)), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    ref = m.apply({"params": params}, x)
    wts = FusedChainWeights(params, lead=None, rdb="bottle_rdb", res=None)
    out = fused_rdb_chain(x, wts, s_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pack_w9_tap_order(rng):
    """W9[c, t·Cout+c'] = W[dy,dx,c,c'] with t = dy·3+dx."""
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    w9 = pack_w9(w)
    assert w9.shape == (5, 63)
    for t in range(9):
        dy, dx = divmod(t, 3)
        np.testing.assert_array_equal(
            np.asarray(w9[:, t * 7 : (t + 1) * 7]), np.asarray(w[dy, dx])
        )


@pytest.mark.slow
def test_fused_forward_matches_improved_unet(rng):
    """Whole-model parity: fused apply ≡ flax apply on the same param tree
    (f32, depth-4, noise estimator on)."""
    from image_denoising_tpu.models.fused_forward import improved_unet_fused_apply

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=8)
    x = jnp.asarray(rng.random((1, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)
    out = improved_unet_fused_apply(params, x, in_nc=1, n_feature=8,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_auto_slab_rows_divides_any_height():
    """Auto slab selection must return a divisor of H for heights whose
    halving sequence passes through non-divisors (e.g. 900 → 225 → 112)."""
    import numpy as np

    from image_denoising_tpu.ops.fused_block_pallas import _auto_slab_rows

    for h in (900, 704, 352, 360, 1000, 977):  # incl. a prime
        for budget in (1 << 20, 8 << 20, 96 << 20):
            sr = _auto_slab_rows(h, w_img=704, k=6, feats_pad=256, growth=24,
                                 nf=48, compute_dtype=np.float32,
                                 budget=budget)
            assert h % sr == 0, (h, budget, sr)
