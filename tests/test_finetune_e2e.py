"""End-to-end finetune + adapter/memory eval CLI smoke tests."""
import glob
import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # multi-minute e2e tier

@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("semdata_ft")
    (root / "clean").mkdir()
    (root / "noise").mkdir()
    rng = np.random.default_rng(11)
    for i in range(3):
        yy, xx = np.mgrid[0:64, 0:64]
        clean = (
            100 + 80 * np.cos(yy / 9.0) + 30 * ((xx // 8) % 2)
        ).clip(0, 255).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, 12, clean.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(clean).save(root / "clean" / f"sem0000_{i:02d}.png")
        Image.fromarray(noisy).save(root / "noise" / f"sem0000_{i:02d}.png")
    return str(root)


@pytest.fixture(scope="module")
def base_ckpt(fixture_dataset, tmp_path_factory):
    """Tiny pretrained base checkpoint from one trainer epoch."""
    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path_factory.mktemp("results_base"))
    train_cli.main([
        "--data_dir", fixture_dataset,
        "--save_model_path", save_root,
        "--log_name", "UNetImproved_base",
        "--n_feature", "16",
        "--n_epoch", "1",
        "--batchsize", "2",
    ])
    ckpts = glob.glob(os.path.join(save_root, "**", "epoch_model_001.ckpt"),
                      recursive=True)
    assert ckpts
    return ckpts[0]


def test_finetune_adapter_and_eval(fixture_dataset, base_ckpt, tmp_path):
    from image_denoising_tpu.cli import evaluation_adapter, finetune

    save_root = str(tmp_path / "ft")
    finetune.main([
        "--data_dir", fixture_dataset,
        "--pretrained_ckpt", base_ckpt,
        "--arch", "UNetImproved",
        "--save_model_path", save_root,
        "--log_name", "ft_test",
        "--n_feature", "16",
        "--n_epoch", "2",
        "--batchsize", "2",
        "--patch_size", "32",
        "--patches_per_image", "4",
    ])
    ckpt = os.path.join(save_root, "ft_test", "epoch_adapter_002.ckpt")
    assert os.path.exists(ckpt)

    avg_psnr = evaluation_adapter.main([
        "--data_dir", fixture_dataset,
        "--ckpt", ckpt,
        "--arch", "UNetImproved",
        "--save_dir", str(tmp_path / "infer"),
        "--n_feature", "16",
    ])
    assert avg_psnr is not None and avg_psnr > 5.0
    assert [f for f in os.listdir(tmp_path / "infer") if f.endswith(".png")]

    # --save_images none: identical metrics, zero PNGs
    avg_none = evaluation_adapter.main([
        "--data_dir", fixture_dataset,
        "--ckpt", ckpt,
        "--arch", "UNetImproved",
        "--save_dir", str(tmp_path / "infer_none"),
        "--n_feature", "16",
        "--save_images", "none",
    ])
    np.testing.assert_allclose(avg_none, avg_psnr, rtol=1e-6)
    assert not [f for f in os.listdir(tmp_path / "infer_none")
                if f.endswith(".png")]


def test_finetune_iqsl_and_adapter_iqsl_eval(fixture_dataset, base_ckpt, tmp_path):
    from image_denoising_tpu.cli import evaluation_adapter_iqsl, finetune_iqsl

    save_root = str(tmp_path / "ft_iqsl")
    finetune_iqsl.main([
        "--data_dir", fixture_dataset,
        "--pretrained_ckpt", base_ckpt,
        "--arch", "UNetImproved",
        "--save_model_path", save_root,
        "--log_name", "ft_iqsl_test",
        "--n_feature", "16",
        "--n_epoch", "1",
        "--batchsize", "2",
        "--patch_size", "32",
        "--patches_per_image", "4",
        "--lambda_iqsl", "0.1",
    ])
    adapter_ckpt = os.path.join(save_root, "ft_iqsl_test", "epoch_adapter_only_001.ckpt")
    assert os.path.exists(adapter_ckpt)

    eval_args = [
        "--data_dir", fixture_dataset,
        "--base_ckpt", base_ckpt,
        "--adapter_ckpt", adapter_ckpt,
        "--arch", "UNetImproved",
        "--n_feature", "16",
        "--compute_iq_iou",
    ]
    avg = evaluation_adapter_iqsl.main(
        eval_args + ["--save_dir", str(tmp_path / "infer_iqsl")])
    assert "psnr" in avg and "iou_dark" in avg

    # --save_images none: identical metrics, zero PNGs
    avg_none = evaluation_adapter_iqsl.main(
        eval_args + ["--save_dir", str(tmp_path / "infer_iqsl_none"),
                     "--save_images", "none"])
    for k in avg:
        np.testing.assert_allclose(avg_none[k], avg[k], rtol=1e-6, err_msg=k)
    assert not [f for f in os.listdir(tmp_path / "infer_iqsl_none")
                if f.endswith(".png")]


def test_finetune_memory_and_memory_eval(fixture_dataset, base_ckpt, tmp_path):
    from image_denoising_tpu.cli import evaluation_704_iqsl_memory, finetune_memory

    save_root = str(tmp_path / "ft_mem")
    finetune_memory.main([
        "--data_dir", fixture_dataset,
        "--pretrained_ckpt", base_ckpt,
        "--arch", "UNetImproved",
        "--save_model_path", save_root,
        "--log_name", "ft_mem_test",
        "--n_feature", "16",
        "--n_epoch", "1",
        "--batchsize", "2",
        "--patch_size", "32",
        "--patches_per_image", "4",
        "--num_memory_images", "2",
        "--memory_stride", "16",
        "--lambda_iqsl", "0.1",
    ])
    adapter_ckpt = os.path.join(save_root, "ft_mem_test", "epoch_adapter_only_001.ckpt")
    assert os.path.exists(adapter_ckpt)

    eval_args = [
        "--data_dir", fixture_dataset,
        "--base_ckpt", base_ckpt,
        "--adapter_ckpt", adapter_ckpt,
        "--arch", "UNetImproved",
        "--n_feature", "16",
        "--patch_size", "32",
        "--overlap", "16",
        "--num_memory_images", "2",
        "--memory_stride", "16",
        "--compute_iq_iou",
    ]
    avg = evaluation_704_iqsl_memory.main(
        eval_args + ["--save_dir", str(tmp_path / "eval_mem")])
    assert avg["psnr"] > 5.0 and "iou_dark" in avg

    # the lazily-drained --frame_burst CLI path (burst 2 over 3 frames, so a
    # padded tail burst) must reproduce the single-frame path byte-for-byte
    # at the same tile chunking
    timing_path = str(tmp_path / "timing.json")
    avg_fb = evaluation_704_iqsl_memory.main(
        eval_args + ["--save_dir", str(tmp_path / "eval_mem_fb"),
                     "--frame_burst", "2", "--timing_json", timing_path])
    for k in avg:
        np.testing.assert_allclose(avg_fb[k], avg[k], rtol=1e-6, err_msg=k)
    # --timing_json (the steady-state throughput protocol): every frame
    # drained exactly once, timestamps monotone, px_per_frame correct
    import json as _json

    with open(timing_path) as fh:
        timing = _json.load(fh)
    drained = sorted(i for d in timing["drains"] for i in d["frames"])
    n_frames = len([f for f in os.listdir(os.path.join(fixture_dataset, "noise"))])
    assert drained == list(range(n_frames)), drained
    ts = [d["t"] for d in timing["drains"]]
    assert ts == sorted(ts) and all(t >= 0 for t in ts), ts
    from PIL import Image as _Image

    first = sorted(os.listdir(os.path.join(fixture_dataset, "noise")))[0]
    h, w = np.asarray(
        _Image.open(os.path.join(fixture_dataset, "noise", first))).shape[:2]
    assert timing["px_per_frame"] == h * w
    from PIL import Image

    for f in sorted(os.listdir(tmp_path / "eval_mem")):
        if f.endswith(".png"):
            a = np.asarray(Image.open(tmp_path / "eval_mem" / f))
            b = np.asarray(Image.open(tmp_path / "eval_mem_fb" / f))
            assert np.array_equal(a, b), f

    # --save_images none: identical metrics, zero PNGs
    avg_none = evaluation_704_iqsl_memory.main(
        eval_args + ["--save_dir", str(tmp_path / "eval_mem_none"),
                     "--save_images", "none"])
    for k in avg:
        np.testing.assert_allclose(avg_none[k], avg[k], rtol=1e-6, err_msg=k)
    assert not [f for f in os.listdir(tmp_path / "eval_mem_none")
                if f.endswith(".png")]

    # --no_hoist_retrieval (per-forward-chunk retrieval) must reproduce the
    # hoisted default: int8 distances are exact integers, so the retrieval
    # indices are chunking-independent -> byte-identical outputs
    avg_nh = evaluation_704_iqsl_memory.main(
        eval_args + ["--save_dir", str(tmp_path / "eval_mem_nh"),
                     "--bank_dtype", "int8", "--no_hoist_retrieval"])

    # --bank_dtype int8 + --clean_bank_dtype uint8: exact integer distances
    # retrieve the same patches as the f32 bank on this uint8-sourced data,
    # and the uint8 clean store decodes to the exact k/255 floats ->
    # byte-identical outputs and metrics at 8x less total bank HBM
    avg_i8 = evaluation_704_iqsl_memory.main(
        eval_args + ["--save_dir", str(tmp_path / "eval_mem_i8"),
                     "--bank_dtype", "int8", "--clean_bank_dtype", "uint8"])
    for k in avg:
        np.testing.assert_allclose(avg_nh[k], avg_i8[k], rtol=1e-6, err_msg=k)
    for f in sorted(os.listdir(tmp_path / "eval_mem_i8")):
        if f.endswith(".png"):
            a = np.asarray(Image.open(tmp_path / "eval_mem_i8" / f))
            b = np.asarray(Image.open(tmp_path / "eval_mem_nh" / f))
            assert np.array_equal(a, b), f
    for k in avg:
        np.testing.assert_allclose(avg_i8[k], avg[k], rtol=1e-6, err_msg=k)
    for f in sorted(os.listdir(tmp_path / "eval_mem")):
        if f.endswith(".png"):
            a = np.asarray(Image.open(tmp_path / "eval_mem" / f))
            b = np.asarray(Image.open(tmp_path / "eval_mem_i8" / f))
            assert np.array_equal(a, b), f

    # --device_metrics: PSNR + IQ-IoU scored on device (f32) against the
    # host f32-PSNR/f64-quantile pass; with --save_images none predictions
    # are never fetched (scalars-only D2H)
    avg_dm = evaluation_704_iqsl_memory.main(
        eval_args + ["--save_dir", str(tmp_path / "eval_mem_dm"),
                     "--frame_burst", "2", "--device_metrics",
                     "--save_images", "none"])
    assert abs(avg_dm["psnr"] - avg["psnr"]) < 1e-3
    for key in ("iou_dark", "iou_mid", "iou_bright"):
        np.testing.assert_allclose(avg_dm[key], avg[key], atol=1e-6)
    assert not [f for f in os.listdir(tmp_path / "eval_mem_dm")
                if f.endswith(".png")]


def test_finetune_memory_bf16_cli(fixture_dataset, base_ckpt, tmp_path):
    """--dtype bfloat16 through the memory finetune + memory eval CLIs
    (regression: the FFT adapter's rfft and the lowpass depthwise conv
    crashed on a bf16 base)."""
    from image_denoising_tpu.cli import evaluation_704_iqsl_memory, finetune_memory

    save_root = str(tmp_path / "ft_mem_bf16")
    finetune_memory.main([
        "--data_dir", fixture_dataset,
        "--pretrained_ckpt", base_ckpt,
        "--arch", "UNetImproved",
        "--save_model_path", save_root,
        "--log_name", "ft_mem_bf16",
        "--n_feature", "16",
        "--n_epoch", "1",
        "--batchsize", "2",
        "--patch_size", "32",
        "--patches_per_image", "2",
        "--num_memory_images", "2",
        "--memory_stride", "16",
        "--dtype", "bfloat16",
    ])
    adapter_ckpt = os.path.join(save_root, "ft_mem_bf16", "epoch_adapter_only_001.ckpt")
    assert os.path.exists(adapter_ckpt)

    avg = evaluation_704_iqsl_memory.main([
        "--data_dir", fixture_dataset,
        "--base_ckpt", base_ckpt,
        "--adapter_ckpt", adapter_ckpt,
        "--arch", "UNetImproved",
        "--save_dir", str(tmp_path / "eval_mem_bf16"),
        "--n_feature", "16",
        "--patch_size", "32",
        "--overlap", "16",
        "--num_memory_images", "2",
        "--memory_stride", "16",
        "--dtype", "bfloat16",
    ])
    assert avg["psnr"] > 5.0


def test_finetune_parallel_flag(fixture_dataset, base_ckpt, tmp_path):
    """--parallel shards patch batches over the 8-device CPU mesh."""
    from image_denoising_tpu.cli import finetune

    save_root = str(tmp_path / "ft_par")
    finetune.main([
        "--data_dir", fixture_dataset,
        "--pretrained_ckpt", base_ckpt,
        "--arch", "UNetImproved",
        "--save_model_path", save_root,
        "--log_name", "ft_par",
        "--n_feature", "16",
        "--n_epoch", "1",
        "--batchsize", "8",
        "--patch_size", "32",
        "--patches_per_image", "8",
        "--parallel",
    ])
    assert os.path.exists(os.path.join(save_root, "ft_par", "epoch_adapter_001.ckpt"))
