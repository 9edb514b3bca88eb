"""Dataset prep tools (D7/D8 — dataset_tool.py / dataset_tool_raw.py parity)."""
import os

import numpy as np
import pytest


def test_filter_image_sizes_bounds(tmp_path):
    """Reference filter keeps images with BOTH sides in [256, 512]
    (dataset_tool.py:1-24); exercised here at a scaled-down bound."""
    from PIL import Image

    from image_denoising_tpu.data.prep import filter_image_sizes

    sizes = {
        "keep_min.png": (64, 64),
        "keep_max.png": (128, 128),
        "keep_rect.png": (64, 128),
        "too_small.png": (63, 64),
        "too_big.png": (129, 64),
    }
    for name, (w, h) in sizes.items():
        Image.fromarray(np.zeros((h, w), np.uint8)).save(tmp_path / name)
    (tmp_path / "corrupt.png").write_bytes(b"not an image")

    kept = filter_image_sizes(
        sorted(str(tmp_path / n) for n in list(sizes) + ["corrupt.png"]),
        min_side=64, max_side=128,
    )
    assert sorted(os.path.basename(p) for p in kept) == [
        "keep_max.png", "keep_min.png", "keep_rect.png"
    ]


def test_filter_imagenet_reencodes_rgb(tmp_path):
    from PIL import Image

    from image_denoising_tpu.data.prep import filter_imagenet

    src = tmp_path / "src"
    src.mkdir()
    Image.fromarray(np.full((64, 64), 7, np.uint8)).save(src / "gray.png")
    Image.fromarray(np.zeros((32, 32), np.uint8)).save(src / "small.png")

    dst = tmp_path / "dst"
    n = filter_imagenet(str(src), str(dst), min_side=64, max_side=128)
    assert n == 1
    out = Image.open(dst / "gray.png")
    assert out.mode == "RGB" and out.size == (64, 64)
    assert np.array_equal(np.asarray(out), np.full((64, 64, 3), 7, np.uint8))


def test_crop_sidd_raw_grid(tmp_path):
    """Edge-snapped crop grid matches the reference's np.arange + appended
    last-row/col logic (dataset_tool_raw.py:25-39); tiles round-trip by value."""
    h5py = pytest.importorskip("h5py")
    from scipy.io import loadmat

    from image_denoising_tpu.data.prep import crop_sidd_raw

    rng = np.random.default_rng(0)
    big = rng.random((80, 112)).astype(np.float64)
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    with h5py.File(raw_dir / "0001_NOISY_RAW.MAT", "w") as f:
        f.create_dataset("x", data=big)

    out = tmp_path / "tiles"
    n = crop_sidd_raw(str(raw_dir), str(out), crop_size=64, step=32)
    # h: starts 0, 16 appended (80-64); w: 0, 32, 48 appended (112-64)
    assert n == 2 * 3
    tiles = sorted(os.listdir(out))
    assert len(tiles) == 6 and all(t.endswith(".mat") for t in tiles)
    first = loadmat(out / tiles[0])["x"]
    assert first.shape == (64, 64)
    np.testing.assert_array_equal(first, big[:64, :64])
