"""RGB 3-channel mode (BASELINE.json config: in_nc=out_nc=3 across
train/finetune/eval)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rgb_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("rgbdata")
    (root / "clean").mkdir()
    (root / "noise").mkdir()
    rng = np.random.default_rng(21)
    for i in range(2):
        yy, xx = np.mgrid[0:64, 0:64]
        clean = np.stack(
            [
                (120 + 60 * np.sin(xx / 5.0 + k)).clip(0, 255)
                for k in range(3)
            ],
            axis=-1,
        ).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, 12, clean.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(clean).save(root / "clean" / f"rgb_{i}.png")
        Image.fromarray(noisy).save(root / "noise" / f"rgb_{i}.png")
    return str(root)


@pytest.mark.slow
def test_rgb_train_and_whole_frame_eval(rgb_dataset, tmp_path):
    from image_denoising_tpu.cli import evaluation as eval_cli
    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path / "results")
    train_cli.main([
        "--data_dir", rgb_dataset,
        "--save_model_path", save_root,
        "--log_name", "UNetImproved_rgb",
        "--n_feature", "16",
        "--n_channel", "3",
        "--n_epoch", "1",
        "--batchsize", "2",
    ])
    import glob

    ckpt = glob.glob(os.path.join(save_root, "**", "epoch_model_001.ckpt"),
                     recursive=True)[0]
    avg = eval_cli.main([
        "--data_dir", rgb_dataset,
        "--checkpoint", ckpt,
        "--save_dir", str(tmp_path / "eval"),
        "--n_feature", "16",
        "--n_channel", "3",
        "--log_name", "UNetImproved_rgb",
    ])
    assert avg["psnr"] > 5.0

    # --device_metrics handles 3-channel frames (per-channel SSIM mean,
    # matching calculate_ssim's dispatch)
    avg_dm = eval_cli.main([
        "--data_dir", rgb_dataset,
        "--checkpoint", ckpt,
        "--save_dir", str(tmp_path / "eval_dm"),
        "--n_feature", "16",
        "--n_channel", "3",
        "--log_name", "UNetImproved_rgb",
        "--device_metrics",
        "--save_images", "none",
    ])
    assert abs(avg_dm["psnr"] - avg["psnr"]) < 1e-3
    assert abs(avg_dm["ssim"] - avg["ssim"]) < 1e-4
    assert abs(avg_dm["l1"] - avg["l1"]) < 1e-6


def test_rgb_n2n_subsampler_and_losses(rng):
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.losses import structure_loss
    from image_denoising_tpu.ops import AugmentNoise, subsample_pair

    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    sub1, sub2, _ = subsample_pair(jax.random.PRNGKey(0), x)
    assert sub1.shape == (2, 16, 16, 3)
    aug = AugmentNoise("gauss25")
    y = aug.add_train_noise(jax.random.PRNGKey(1), x)
    assert y.shape == x.shape
    loss = structure_loss(y, x, x)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_rgb_adapter_finetune(rgb_dataset, tmp_path):
    import glob

    from image_denoising_tpu.cli import finetune, train as train_cli

    save_root = str(tmp_path / "base")
    train_cli.main([
        "--data_dir", rgb_dataset,
        "--save_model_path", save_root,
        "--log_name", "UNetImproved_rgb",
        "--n_feature", "16",
        "--n_channel", "3",
        "--n_epoch", "1",
        "--batchsize", "2",
    ])
    ckpt = glob.glob(os.path.join(save_root, "**", "epoch_model_001.ckpt"),
                     recursive=True)[0]
    finetune.main([
        "--data_dir", rgb_dataset,
        "--pretrained_ckpt", ckpt,
        "--arch", "UNetImproved",
        "--save_model_path", str(tmp_path / "ft"),
        "--log_name", "rgb_ft",
        "--n_feature", "16",
        "--n_channel", "3",
        "--n_epoch", "1",
        "--batchsize", "2",
        "--patch_size", "32",
        "--patches_per_image", "4",
    ])
    assert os.path.exists(os.path.join(str(tmp_path / "ft"), "rgb_ft",
                                       "epoch_adapter_001.ckpt"))
