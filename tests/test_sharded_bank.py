"""Mesh-sharded memory bank: ring (ppermute) top-1 retrieval must return the
same patches as the replicated MXU-matmul path, and shard_batch must handle
batch sizes that do not divide the mesh (reference default batch 4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_denoising_tpu.adapters.wrappers import select_memory_patch
from image_denoising_tpu.memory import MemoryBank, make_ring_retrieval, shard_bank
from image_denoising_tpu.parallel import make_mesh, replicate, shard_batch


def _bank(rng, n, ps=8, c=1):
    noise = rng.random((n, ps * ps * c)).astype(np.float32)
    clean = rng.random((n, ps, ps, c)).astype(np.float32)
    return MemoryBank(
        noise_flat=jnp.asarray(noise),
        clean=jnp.asarray(clean),
        sq_norms=jnp.sum(jnp.asarray(noise) ** 2, axis=1),
        patch_size=ps,
        stride=4,
    )


def test_ring_retrieval_matches_replicated(rng):
    mesh = make_mesh(8)
    bank = _bank(rng, 44)  # 44 % 8 != 0 → shard_bank pads to 48
    queries = jnp.asarray(rng.random((16, 8, 8, 1)).astype(np.float32))

    expected = select_memory_patch(queries, bank.noise_flat, bank.clean,
                                   bank.sq_norms)

    sbank = shard_bank(bank, mesh, "data")
    assert sbank.noise_flat.shape[0] == 48
    ring = make_ring_retrieval(mesh, "data", queries_sharded=True)
    got = jax.jit(ring)(queries, sbank.noise_flat, sbank.clean, sbank.sq_norms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=0)


def test_ring_retrieval_replicated_queries(rng):
    mesh = make_mesh(8)
    bank = _bank(rng, 24)
    queries = jnp.asarray(rng.random((5, 8, 8, 1)).astype(np.float32))  # 5 ∤ 8

    expected = select_memory_patch(queries, bank.noise_flat, bank.clean,
                                   bank.sq_norms)
    sbank = shard_bank(bank, mesh, "data")
    ring = make_ring_retrieval(mesh, "data", queries_sharded=False)
    got = jax.jit(ring)(queries, sbank.noise_flat, sbank.clean, sbank.sq_norms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=0)


def test_ring_retrieval_tie_breaks_to_first(rng):
    """Duplicate bank rows across different shards: global first-min wins."""
    mesh = make_mesh(8)
    ps = 4
    noise = rng.random((16, ps * ps)).astype(np.float32)
    noise[9] = noise[2]  # duplicate row 2 (shard 1) at row 9 (shard 4)
    clean = rng.random((16, ps, ps, 1)).astype(np.float32)
    bank = MemoryBank(
        noise_flat=jnp.asarray(noise),
        clean=jnp.asarray(clean),
        sq_norms=jnp.sum(jnp.asarray(noise) ** 2, axis=1),
        patch_size=ps,
        stride=4,
    )
    queries = jnp.asarray(noise[9].reshape(1, ps, ps, 1))  # exact duplicate hit
    sbank = shard_bank(bank, mesh, "data")
    ring = make_ring_retrieval(mesh, "data", queries_sharded=False)
    got = np.asarray(
        jax.jit(ring)(queries, sbank.noise_flat, sbank.clean, sbank.sq_norms)
    )
    np.testing.assert_allclose(got[0], clean[2], atol=0)  # index 2, not 9


@pytest.mark.slow
def test_memory_wrapper_with_ring_retrieval(rng):
    """DenoiserWithMemoryAdapter(retrieval_fn=ring) ≡ replicated wrapper."""
    from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter
    from image_denoising_tpu.models import UNet

    mesh = make_mesh(8)
    base = UNet(in_nc=1, out_nc=1, n_feature=8)
    bank = _bank(rng, 16, ps=32)
    tiles = jnp.asarray(rng.random((8, 32, 32, 1)).astype(np.float32))

    ref_wrapper = DenoiserWithMemoryAdapter(base=base, hidden_channels=8)
    params = jax.jit(ref_wrapper.init)(
        jax.random.PRNGKey(0), tiles, bank.noise_flat, bank.clean, bank.sq_norms
    )["params"]
    expected = ref_wrapper.apply(
        {"params": params}, tiles, bank.noise_flat, bank.clean, bank.sq_norms
    )

    sbank = shard_bank(bank, mesh, "data")
    ring_wrapper = DenoiserWithMemoryAdapter(
        base=base, hidden_channels=8,
        retrieval_fn=make_ring_retrieval(mesh, "data", queries_sharded=True),
    )
    got = jax.jit(
        lambda p, t, bn, bc, bs: ring_wrapper.apply({"params": p}, t, bn, bc, bs)
    )(replicate(mesh, params), tiles, sbank.noise_flat, sbank.clean, sbank.sq_norms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


@pytest.mark.slow
def test_memory_finetune_step_with_sharded_bank_matches_replicated(rng):
    """The memory FINETUNE step (adapter-only gradients) with both banks
    sharded + ring retrieval must produce the same adapter update as the
    replicated-bank step (VERDICT r2 weak #4 / next #4; ref geometry
    finetune_memory.py:1256-1277). Gradients flow only to the adapter, so
    the ring stays inference-only inside the step."""
    from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter
    from image_denoising_tpu.models import UNet
    from image_denoising_tpu.train import create_train_state
    from image_denoising_tpu.train.finetune_steps import make_memory_finetune_step

    mesh = make_mesh(8)
    base = UNet(in_nc=1, out_nc=1, n_feature=8)
    bank = _bank(rng, 20, ps=32)  # 20 % 8 != 0 → shard_bank pads to 24
    clean01 = jnp.asarray(rng.random((4, 32, 32, 1)).astype(np.float32))
    noisy01 = jnp.asarray(rng.random((4, 32, 32, 1)).astype(np.float32))

    sbank = shard_bank(bank, mesh, "data")
    wrappers = {
        "repl": (DenoiserWithMemoryAdapter(base=base, hidden_channels=8), bank),
        "ring": (
            DenoiserWithMemoryAdapter(
                base=base, hidden_channels=8,
                retrieval_fn=make_ring_retrieval(mesh, "data",
                                                 queries_sharded=False),
            ),
            sbank,
        ),
    }

    results = {}
    for name, (wrapper, bk) in wrappers.items():
        variables = jax.jit(wrapper.init)(
            jax.random.PRNGKey(0), noisy01, bk.noise_flat, bk.clean, bk.sq_norms
        )
        base_params = variables["params"]["base"]
        state = create_train_state(variables["params"]["adapter"], lr=1e-3)
        step = make_memory_finetune_step(wrapper.apply, lambda_grad=0.1)
        for _ in range(2):
            state, m = step(state, base_params, clean01, noisy01,
                            bk.noise_flat, bk.clean, bk.sq_norms)
        results[name] = (float(m["loss"]), state.params)

    (loss_r, p_r), (loss_s, p_s) = results["repl"], results["ring"]
    assert abs(loss_r - loss_s) < 1e-6, (loss_r, loss_s)
    for a, b in zip(jax.tree_util.tree_leaves(p_r), jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_shard_batch_non_divisible_trains(rng):
    """Reference default batch 4 on an 8-device mesh: gcd sub-mesh replication
    gives the exact same update as the unsharded step."""
    from image_denoising_tpu.models import UNet
    from image_denoising_tpu.train import create_train_state, make_structure_train_step

    mesh = make_mesh(8)
    model = UNet(in_nc=1, out_nc=1, n_feature=8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))
    )["params"]
    clean = rng.random((4, 32, 32, 1)).astype(np.float32) * 255
    noisy = rng.random((4, 32, 32, 1)).astype(np.float32) * 255
    step = make_structure_train_step(model.apply)

    # independent param copies: the step donates its state, and device_put
    # aliases the source cpu:0 buffer when replicating
    params_copy = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), params)
    s_mesh = create_train_state(replicate(mesh, params_copy), lr=1e-3)
    s_single = create_train_state(params, lr=1e-3)
    s_single, m_single = step(s_single, jnp.asarray(clean), jnp.asarray(noisy))

    batch = shard_batch(mesh, (clean, noisy), axis_name="data")
    s_mesh, m_mesh = step(s_mesh, *batch)

    assert abs(float(m_single["loss"]) - float(m_mesh["loss"])) < 1e-6
    a = jax.tree_util.tree_leaves(s_single.params)
    b = jax.tree_util.tree_leaves(s_mesh.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def _int8_twin_banks(rng, n, ps=8, c=1):
    """(int8 bank, f32 twin) over the SAME uint8-sourced patches."""
    noise_u8 = rng.integers(0, 256, (n, ps * ps * c)).astype(np.uint8)
    clean = rng.random((n, ps, ps, c)).astype(np.float32)
    noise_i = noise_u8.astype(np.int32) - 128
    i8 = MemoryBank(
        noise_flat=jnp.asarray(noise_i.astype(np.int8)),
        clean=jnp.asarray(clean),
        sq_norms=jnp.asarray(np.sum(noise_i * noise_i, axis=1).astype(np.int32)),
        patch_size=ps,
        stride=4,
    )
    f = noise_u8.astype(np.float32) / 255.0
    f32 = MemoryBank(
        noise_flat=jnp.asarray(f),
        clean=jnp.asarray(clean),
        sq_norms=jnp.asarray(np.sum(f * f, axis=1)),
        patch_size=ps,
        stride=4,
    )
    return i8, f32, noise_u8


def test_int8_retrieval_matches_f32(rng):
    """int8 banks (exact integer distances on the int8 MXU path) retrieve the
    same patches as the f32 path on uint8-sourced data; tie-breaking stays
    first-min. (int8 + Pallas exactness lives in
    test_pallas_kernels.test_select_memory_patch_int8_pallas_matches_xla.)"""
    i8, f32, noise_u8 = _int8_twin_banks(rng, 33)
    q_u8 = rng.integers(0, 256, (7, 8, 8, 1)).astype(np.uint8)
    queries = jnp.asarray(q_u8.astype(np.float32) / 255.0)

    expected = select_memory_patch(queries, f32.noise_flat, f32.clean,
                                   f32.sq_norms)
    got = select_memory_patch(queries, i8.noise_flat, i8.clean, i8.sq_norms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=0)

    # sq_norms=None recomputes the int-domain norms in-graph
    got2 = select_memory_patch(queries, i8.noise_flat, i8.clean, None)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(expected), atol=0)

    # exact-duplicate query + duplicated bank row -> FIRST index wins
    # (integer distances are exactly equal, so this pins the tie-break)
    _, f32_dup, nb = _int8_twin_banks(rng, 16)
    nb[11] = nb[3]
    noise_i = nb.astype(np.int32) - 128
    i8_dup = MemoryBank(
        noise_flat=jnp.asarray(noise_i.astype(np.int8)),
        clean=f32_dup.clean,
        sq_norms=jnp.asarray(np.sum(noise_i * noise_i, axis=1).astype(np.int32)),
        patch_size=8,
        stride=4,
    )
    qdup = jnp.asarray(nb[11].astype(np.float32).reshape(1, 8, 8, 1) / 255.0)
    got_dup = select_memory_patch(qdup, i8_dup.noise_flat, i8_dup.clean,
                                  i8_dup.sq_norms)
    np.testing.assert_allclose(np.asarray(got_dup)[0],
                               np.asarray(f32_dup.clean)[3], atol=0)


def test_int8_ring_matches_replicated(rng):
    """Ring retrieval over a sharded int8 bank (int32-max padding rows) ==
    the replicated int8 path."""
    mesh = make_mesh(8)
    i8, _, _ = _int8_twin_banks(rng, 44)  # 44 % 8 != 0 -> pads to 48
    q_u8 = rng.integers(0, 256, (16, 8, 8, 1)).astype(np.uint8)
    queries = jnp.asarray(q_u8.astype(np.float32) / 255.0)

    expected = select_memory_patch(queries, i8.noise_flat, i8.clean,
                                   i8.sq_norms)
    sbank = shard_bank(i8, mesh, "data")
    assert sbank.noise_flat.dtype == jnp.int8
    assert np.asarray(sbank.sq_norms)[-1] == np.iinfo(np.int32).max
    ring = make_ring_retrieval(mesh, "data", queries_sharded=True)
    got = jax.jit(ring)(queries, sbank.noise_flat, sbank.clean, sbank.sq_norms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=0)


def test_memory_finetune_step_int8_bank_matches_f32(rng):
    """The memory finetune step with an int8 bank produces the same adapter
    update as with the f32 twin bank (identical retrieved patches; gradients
    never flow through the integer retrieval — it sits under stop_gradient)."""
    from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter
    from image_denoising_tpu.models import UNet
    from image_denoising_tpu.train import create_train_state
    from image_denoising_tpu.train.finetune_steps import make_memory_finetune_step

    base = UNet(in_nc=1, out_nc=1, n_feature=8)
    i8, f32, _ = _int8_twin_banks(rng, 20, ps=32)
    clean_u8 = rng.integers(0, 256, (4, 32, 32, 1)).astype(np.uint8)
    noisy_u8 = rng.integers(0, 256, (4, 32, 32, 1)).astype(np.uint8)
    clean01 = jnp.asarray(clean_u8.astype(np.float32) / 255.0)
    noisy01 = jnp.asarray(noisy_u8.astype(np.float32) / 255.0)

    wrapper = DenoiserWithMemoryAdapter(base=base, hidden_channels=8)
    results = {}
    for name, bk in (("f32", f32), ("int8", i8)):
        variables = jax.jit(wrapper.init)(
            jax.random.PRNGKey(0), noisy01, bk.noise_flat, bk.clean, bk.sq_norms
        )
        base_params = variables["params"]["base"]
        state = create_train_state(variables["params"]["adapter"], lr=1e-3)
        step = make_memory_finetune_step(wrapper.apply, lambda_grad=0.1)
        for _ in range(2):
            state, m = step(state, base_params, clean01, noisy01,
                            bk.noise_flat, bk.clean, bk.sq_norms)
        results[name] = (float(m["loss"]), state.params)

    (loss_f, p_f), (loss_i, p_i) = results["f32"], results["int8"]
    assert abs(loss_f - loss_i) < 1e-7, (loss_f, loss_i)
    for a, b in zip(jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_i)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_batched_select_matches_plain(rng):
    """The hoisted-retrieval helper (one bank pass over a whole tile stack
    in query chunks) must return exactly the patches of the per-call path —
    f32 and exact-int8 banks, non-multiple stack sizes (pad tail)."""
    from image_denoising_tpu.adapters import (batched_select_memory_patch,
                                              select_memory_patch)

    bank = _bank(rng, 40)
    for t in (5, 16, 37):  # < chunk, multiple, padded tail (chunk=16)
        q = jnp.asarray(rng.random((t, 8, 8, 1)).astype(np.float32))
        want = select_memory_patch(q, bank.noise_flat, bank.clean,
                                   bank.sq_norms)
        # chunk=16: round-4 fixed chunking; chunk=10**9: the CLI's
        # --retrieval_chunk 0 single-pass default (PERF §7.2)
        for chunk in (16, 10 ** 9):
            got = batched_select_memory_patch(q, bank.noise_flat, bank.clean,
                                              bank.sq_norms, chunk=chunk)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # int8 bank: centered-byte queries, exact int32 distances
    bank8, _, _ = _int8_twin_banks(rng, 24)
    q = jnp.asarray(
        (rng.integers(0, 256, (19, 8, 8, 1)) / 255.0).astype(np.float32)
    )
    want = select_memory_patch(q, bank8.noise_flat, bank8.clean,
                               bank8.sq_norms)
    got = batched_select_memory_patch(q, bank8.noise_flat, bank8.clean,
                                      bank8.sq_norms, chunk=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_memory_wrapper_precomputed_mem_clean(rng):
    """mem_clean= must bypass retrieval and reproduce the built-in path
    bit-for-bit (the hoisted evaluators feed precomputed patches)."""
    from image_denoising_tpu.adapters import (DenoiserWithMemoryAdapter,
                                              batched_select_memory_patch)
    from image_denoising_tpu.models import ImprovedUNet

    bank = _bank(rng, 24, ps=16)
    base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=8)
    wrapper = DenoiserWithMemoryAdapter(base=base, in_channels=1,
                                        hidden_channels=8)
    q = jnp.asarray(rng.random((6, 16, 16, 1)).astype(np.float32))
    params = jax.jit(wrapper.init)(
        jax.random.PRNGKey(0), q, bank.noise_flat, bank.clean, bank.sq_norms
    )["params"]

    want = jax.jit(wrapper.apply)(
        {"params": params}, q, bank.noise_flat, bank.clean, bank.sq_norms
    )
    mem = batched_select_memory_patch(q, bank.noise_flat, bank.clean,
                                      bank.sq_norms, chunk=4)
    got = jax.jit(
        lambda p, x, m: wrapper.apply(
            {"params": p}, x, bank.noise_flat, bank.clean, bank.sq_norms,
            mem_clean=m,
        )
    )(params, q, mem)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_uint8_clean_bank_exact(rng):
    """clean_dtype="uint8" is LOSSLESS for uint8-sourced clean patches: the
    post-gather /255 restores the exact floats, so retrieval output is
    bit-identical to the f32-stored clean bank — replicated select, the
    batched hoisted path, and the ring over uint8-clean shards."""
    from image_denoising_tpu.adapters import (batched_select_memory_patch,
                                              select_memory_patch)

    ps = 8
    clean_u8 = rng.integers(0, 256, (24, ps, ps, 1)).astype(np.uint8)
    noise = rng.random((24, ps * ps)).astype(np.float32)
    norms = jnp.sum(jnp.asarray(noise) ** 2, axis=1)
    clean_f32 = jnp.asarray(clean_u8.astype(np.float32) / 255.0)
    clean_dev8 = jnp.asarray(clean_u8)

    q = jnp.asarray(rng.random((9, ps, ps, 1)).astype(np.float32))
    want = select_memory_patch(q, jnp.asarray(noise), clean_f32, norms)
    got = select_memory_patch(q, jnp.asarray(noise), clean_dev8, norms)
    assert got.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    got_b = batched_select_memory_patch(q, jnp.asarray(noise), clean_dev8,
                                        norms, chunk=4)
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want))

    # ring retrieval ppermutes uint8 clean shards (4x less ICI traffic);
    # the wrapper decodes after retrieval_fn — compare through the wrapper
    from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter
    from image_denoising_tpu.models import UNet

    mesh = make_mesh(8)
    bank8 = MemoryBank(noise_flat=jnp.asarray(noise), clean=clean_dev8,
                       sq_norms=norms, patch_size=ps, stride=4)
    sbank = shard_bank(bank8, mesh, "data")
    assert sbank.clean.dtype == jnp.uint8
    base = UNet(in_nc=1, out_nc=1, n_feature=8)
    q32 = jnp.asarray(rng.random((4, 32, 32, 1)).astype(np.float32))
    bankf = MemoryBank(
        noise_flat=jnp.asarray(rng.random((16, 32 * 32)).astype(np.float32)),
        clean=jnp.asarray(
            rng.integers(0, 256, (16, 32, 32, 1)).astype(np.uint8)
        ),
        sq_norms=None, patch_size=32, stride=4,
    )
    bankf_norms = jnp.sum(bankf.noise_flat**2, axis=1)
    w_plain = DenoiserWithMemoryAdapter(base=base, hidden_channels=8)
    params = jax.jit(w_plain.init)(
        jax.random.PRNGKey(0), q32, bankf.noise_flat, bankf.clean, bankf_norms
    )["params"]
    want_w = w_plain.apply({"params": params}, q32, bankf.noise_flat,
                           bankf.clean, bankf_norms)
    sb = shard_bank(
        MemoryBank(noise_flat=bankf.noise_flat, clean=bankf.clean,
                   sq_norms=bankf_norms, patch_size=32, stride=4),
        mesh, "data",
    )
    w_ring = DenoiserWithMemoryAdapter(
        base=base, hidden_channels=8,
        retrieval_fn=make_ring_retrieval(mesh, "data", queries_sharded=False),
    )
    got_w = jax.jit(
        lambda p, t, bn, bc, bs: w_ring.apply({"params": p}, t, bn, bc, bs)
    )(replicate(mesh, params), q32, sb.noise_flat, sb.clean, sb.sq_norms)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               atol=1e-6)
