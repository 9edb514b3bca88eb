"""--parallel on the eval CLIs must produce byte-identical outputs to the
single-device path (VERDICT r1: the flags were accepted but dead)."""
import glob
import os

import numpy as np
import pytest

import jax


pytestmark = pytest.mark.slow  # multi-minute e2e tier

@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("semdata_par")
    (root / "clean").mkdir()
    (root / "noise").mkdir()
    rng = np.random.default_rng(23)
    for i in range(3):
        yy, xx = np.mgrid[0:64, 0:64]
        clean = (
            90 + 70 * np.sin(xx / 7.0 + i) + 35 * ((yy // 8) % 2)
        ).clip(0, 255).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, 14, clean.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(clean).save(root / "clean" / f"sem_{i:02d}.png")
        Image.fromarray(noisy).save(root / "noise" / f"sem_{i:02d}.png")
    return str(root)


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    """Random-init base / wrapper / memory-adapter checkpoints (no training —
    output identity is what's under test, not quality)."""
    import jax.numpy as jnp

    from image_denoising_tpu.adapters import (
        DenoiserWithAdapter,
        DenoiserWithMemoryAdapter,
    )
    from image_denoising_tpu.ckpt import save_checkpoint
    from image_denoising_tpu.models import ImprovedUNet

    root = str(tmp_path_factory.mktemp("ckpts_par"))
    base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=8)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    base_params = jax.jit(base.init)(jax.random.PRNGKey(0), x)["params"]
    base_path = save_checkpoint(base_params, root, "model", 1)

    wrapper = DenoiserWithAdapter(base=base, hidden_channels=8)
    wparams = jax.jit(wrapper.init)(jax.random.PRNGKey(1), x)["params"]
    wrapper_path = save_checkpoint(wparams, root, "adapter", 1)

    mem = DenoiserWithMemoryAdapter(base=base, hidden_channels=8)
    bank_n = jnp.zeros((4, 32 * 32), jnp.float32)
    bank_c = jnp.zeros((4, 32, 32, 1), jnp.float32)
    mparams = jax.jit(mem.init)(
        jax.random.PRNGKey(2), x, bank_n, bank_c, jnp.zeros((4,), jnp.float32)
    )["params"]
    mem_adapter_path = save_checkpoint(mparams["adapter"], root, "adapter_only", 1)
    return {"base": base_path, "wrapper": wrapper_path, "mem_adapter": mem_adapter_path}


def _pngs(save_dir):
    out = {}
    for p in sorted(glob.glob(os.path.join(save_dir, "*.png"))):
        with open(p, "rb") as f:
            out[os.path.basename(p)] = f.read()
    return out


def test_eval704_parallel_identical(fixture_dataset, ckpts, tmp_path):
    from image_denoising_tpu.cli import evaluation_704

    args = [
        "--data_dir", fixture_dataset,
        "--checkpoint", ckpts["base"],
        "--n_feature", "8",
        "--log_name", "UNetImproved_par",
        "--tile", "32",
        "--overlap", "16",
        "--tile_batch", "0",
        "--compute_iq_iou",
    ]
    avg = evaluation_704.main(args + ["--save_dir", str(tmp_path / "single")])
    evaluation_704.main(args + ["--save_dir", str(tmp_path / "par"), "--parallel"])
    single, par = _pngs(tmp_path / "single"), _pngs(tmp_path / "par")
    assert single and single == par

    # --device_metrics composes with --parallel: the scoring program consumes
    # the still-mesh-sharded burst output; metrics must match the host pass
    avg_dm = evaluation_704.main(
        args + ["--save_dir", str(tmp_path / "par_dm"), "--parallel",
                "--device_metrics"])
    assert abs(avg_dm["psnr"] - avg["psnr"]) < 1e-3
    assert abs(avg_dm["ssim"] - avg["ssim"]) < 1e-5
    for key in ("iou_dark", "iou_mid", "iou_bright"):
        np.testing.assert_allclose(avg_dm[key], avg[key], atol=1e-6)
    assert single == _pngs(tmp_path / "par_dm")


def test_adapter_eval_parallel_identical(fixture_dataset, ckpts, tmp_path):
    from image_denoising_tpu.cli import evaluation_adapter

    args = [
        "--data_dir", fixture_dataset,
        "--ckpt", ckpts["wrapper"],
        "--arch", "UNetImproved",
        "--n_feature", "8",
        "--adapter_hidden", "8",
    ]
    p1 = evaluation_adapter.main(args + ["--save_dir", str(tmp_path / "single")])
    p2 = evaluation_adapter.main(
        args + ["--save_dir", str(tmp_path / "par"), "--parallel"]
    )
    single, par = _pngs(tmp_path / "single"), _pngs(tmp_path / "par")
    assert single and single == par
    assert abs(p1 - p2) < 1e-9


def test_memory_eval_parallel_bank_sharded_identical(fixture_dataset, ckpts, tmp_path):
    from image_denoising_tpu.cli import evaluation_704_iqsl_memory

    args = [
        "--data_dir", fixture_dataset,
        "--base_ckpt", ckpts["base"],
        "--adapter_ckpt", ckpts["mem_adapter"],
        "--arch", "UNetImproved",
        "--n_feature", "8",
        "--adapter_hidden", "8",
        "--patch_size", "32",
        "--overlap", "16",
        "--num_memory_images", "2",
        "--memory_stride", "16",
        # pin one forward batching for all three paths: --parallel forces
        # tile_batch 0, and different conv batch sizes differ in low-order
        # bits (the default is now the chunk-8 scan). This test is about the
        # sharding machinery, which must be bit-exact at equal batching.
        "--tile_batch", "0",
    ]
    avg = evaluation_704_iqsl_memory.main(
        args + ["--save_dir", str(tmp_path / "single")])
    evaluation_704_iqsl_memory.main(
        args + ["--save_dir", str(tmp_path / "par"), "--parallel"]
    )
    evaluation_704_iqsl_memory.main(
        args + ["--save_dir", str(tmp_path / "shard"), "--bank_sharded"]
    )
    single = _pngs(tmp_path / "single")
    assert single
    assert single == _pngs(tmp_path / "par")
    assert single == _pngs(tmp_path / "shard")

    # ring-sharded bank + device metrics: the scorer consumes the
    # mesh-sharded burst output; PSNR must match the host pass
    avg_dm = evaluation_704_iqsl_memory.main(
        args + ["--save_dir", str(tmp_path / "shard_dm"), "--bank_sharded",
                "--device_metrics", "--save_images", "none"]
    )
    assert abs(avg_dm["psnr"] - avg["psnr"]) < 1e-3
    assert not _pngs(tmp_path / "shard_dm")
