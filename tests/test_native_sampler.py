import numpy as np
import pytest


@pytest.fixture(scope="module")
def sampler(rng_mod):
    from image_denoising_tpu.data.native_sampler import NativePatchSampler, load_library

    if load_library() is None:
        pytest.skip("native sampler library unavailable (no compiler?)")
    imgs = []
    for _ in range(3):
        clean = rng_mod.integers(0, 256, (40, 48, 1)).astype(np.uint8)
        noise = rng_mod.integers(0, 256, (40, 48, 1)).astype(np.uint8)
        imgs.append((clean, noise))
    return NativePatchSampler(imgs, n_threads=3), imgs


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(5)


def test_native_sampler_shapes_and_range(sampler):
    s, _ = sampler
    img_of_item = np.array([0, 1, 2, 0], np.int32)
    clean, noise = s.sample(seed=7, batch_index=0, img_of_item=img_of_item, patch=16)
    assert clean.shape == (4, 16, 16, 1) and noise.shape == (4, 16, 16, 1)
    assert clean.dtype == np.float32
    assert 0.0 <= clean.min() and clean.max() <= 1.0


def test_native_sampler_deterministic(sampler):
    s, _ = sampler
    idx = np.array([0, 1, 2], np.int32)
    a = s.sample(seed=99, batch_index=3, img_of_item=idx, patch=16)
    b = s.sample(seed=99, batch_index=3, img_of_item=idx, patch=16)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    c = s.sample(seed=99, batch_index=4, img_of_item=idx, patch=16)
    assert not np.array_equal(a[0], c[0])


def test_native_sampler_crops_are_aligned(sampler):
    """Clean and noise crops must come from the SAME coordinates."""
    from image_denoising_tpu.data.native_sampler import NativePatchSampler

    rng = np.random.default_rng(0)
    base = rng.integers(0, 200, (64, 64, 1)).astype(np.uint8)
    s = NativePatchSampler([(base, (base + 10).clip(0, 255).astype(np.uint8))])
    clean, noise = s.sample(1, 0, np.array([0], np.int32), 24)
    diff = noise - clean
    # every pixel differs by exactly 10/255 (no saturation for values < 246)
    mask = clean < 245 / 255.0
    np.testing.assert_allclose(diff[mask], 10 / 255.0, atol=1e-6)


def test_native_sampler_patch_values_exist_in_source(sampler):
    s, imgs = sampler
    clean, _ = s.sample(5, 0, np.array([1], np.int32), 16)
    patch_u8 = np.round(clean[0, :, :, 0] * 255).astype(np.uint8)
    src = imgs[1][0][:, :, 0]
    # the patch must appear as a contiguous window of the source image
    found = False
    for top in range(src.shape[0] - 16 + 1):
        for left in range(src.shape[1] - 16 + 1):
            if np.array_equal(src[top : top + 16, left : left + 16], patch_u8):
                found = True
                break
        if found:
            break
    assert found


def test_patch_dataset_uses_native(tmp_path):
    from PIL import Image

    from image_denoising_tpu.data import DenoisePatchDataset
    from image_denoising_tpu.data.native_sampler import load_library

    if load_library() is None:
        pytest.skip("native sampler library unavailable")

    (tmp_path / "clean").mkdir()
    (tmp_path / "noise").mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        arr = rng.integers(0, 256, (48, 48)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "clean" / f"{i}.png")
        Image.fromarray(arr).save(tmp_path / "noise" / f"{i}.png")

    ds = DenoisePatchDataset(str(tmp_path), patch_size=16, patches_per_image=4)
    assert ds._native is not None
    batches = list(ds.batches(4, np.random.default_rng(0)))
    assert len(batches) == 2
    clean, noise = batches[0]
    assert clean.shape == (4, 16, 16, 1)
    np.testing.assert_array_equal(clean, noise)  # identical source images
