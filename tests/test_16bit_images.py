"""16-bit image semantics: ConvertImageDtype-equivalent scaling, no silent
truncation on the patch-sampler path (reference train_opt.py:95-115)."""
import numpy as np
import pytest
from PIL import Image

from image_denoising_tpu.data.pairs import (
    DenoisePatchDataset,
    load_image_f32,
)


@pytest.fixture
def tiff16(tmp_path):
    """Synthetic 16-bit grayscale TIFF with values past the 8-bit range."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 65536, (48, 48), dtype=np.uint16)
    arr[0, 0] = 65535
    arr[0, 1] = 0
    path = tmp_path / "frame16.tiff"
    Image.fromarray(arr).save(path)
    return str(path), arr


def test_load_16bit_tiff_scales_to_255(tiff16):
    path, arr = tiff16
    out = load_image_f32(path)
    expected = arr.astype(np.float32) * (255.0 / 65535.0)
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    assert out.max() == pytest.approx(255.0)
    # the round trip the trainers use: /255 must land in [0,1] like the
    # reference's ConvertImageDtype
    np.testing.assert_allclose(out / 255.0, arr / 65535.0, rtol=1e-6)


def test_load_16bit_convert_l_does_not_truncate(tiff16):
    path, arr = tiff16
    out = load_image_f32(path, convert_l=True)
    np.testing.assert_allclose(
        out, arr.astype(np.float32) * (255.0 / 65535.0), rtol=1e-6
    )


def test_convert_l_still_converts_rgb(tmp_path):
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0] = 255  # pure red → L = 76 (ITU-R 601)
    p = tmp_path / "rgb.png"
    Image.fromarray(rgb).save(p)
    out = load_image_f32(str(p), convert_l=True)
    assert out.shape == (8, 8)
    assert np.all(out == 76.0)


def test_patch_dataset_16bit_uses_numpy_sampler(tmp_path, capsys):
    """16-bit frames must not be squeezed through the uint8 native sampler."""
    rng = np.random.default_rng(5)
    for sub in ("clean", "noise"):
        (tmp_path / sub).mkdir()
        for i in range(2):
            arr = rng.integers(0, 65536, (40, 40), dtype=np.uint16)
            Image.fromarray(arr).save(tmp_path / sub / f"f{i}.tiff")
    ds = DenoisePatchDataset(str(tmp_path), patch_size=16, patches_per_image=2,
                             max_images=2, use_native=True)
    assert ds._native is None
    clean, noisy = next(ds.batches(2, np.random.default_rng(0)))
    # values in [0,1] with sub-8-bit precision preserved (not all k/255)
    assert clean.max() <= 1.0 and clean.min() >= 0.0
    frac = clean * 255.0
    assert not np.allclose(frac, np.round(frac))


def test_patch_dataset_8bit_keeps_native(tmp_path, capsys):
    rng = np.random.default_rng(6)
    for sub in ("clean", "noise"):
        (tmp_path / sub).mkdir()
        for i in range(2):
            arr = rng.integers(0, 256, (40, 40), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / sub / f"f{i}.png")
    DenoisePatchDataset(str(tmp_path), patch_size=16, patches_per_image=2,
                        max_images=2, use_native=True)
    # the uint8-exact gate must not reject plain 8-bit input (the native
    # sampler itself may still be unavailable if the lib isn't built)
    assert "not uint8-exact" not in capsys.readouterr().out


def test_int8_bank_rejects_16bit_noise(tmp_path):
    """int8 banks promise EXACT integer distances — that contract only holds
    for uint8-exact noise frames, so high-bit-depth input must be refused
    (not silently quantized to 256 levels)."""
    from image_denoising_tpu.memory.bank import build_memory_bank

    rng = np.random.default_rng(7)
    clean = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    noise16 = rng.integers(0, 65536, (24, 24), dtype=np.uint16)
    cp, npth = str(tmp_path / "c.png"), str(tmp_path / "n.tiff")
    Image.fromarray(clean).save(cp)
    Image.fromarray(noise16).save(npth)
    with pytest.raises(ValueError, match="uint8-exact"):
        build_memory_bank([cp], [npth], patch_size=8, stride=8,
                          bank_dtype="int8")
    # f32 banks accept the same data (quantization is an int8-only concern)
    bank = build_memory_bank([cp], [npth], patch_size=8, stride=8,
                             bank_dtype="float32")
    assert bank.size == 9


def test_int8_bank_accepts_uint8_noise(tmp_path):
    from image_denoising_tpu.memory.bank import build_memory_bank

    rng = np.random.default_rng(8)
    for name in ("c.png", "n.png"):
        arr = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / name)
    bank = build_memory_bank([str(tmp_path / "c.png")],
                             [str(tmp_path / "n.png")],
                             patch_size=8, stride=8, bank_dtype="int8")
    assert bank.noise_flat.dtype.name == "int8"
    assert bank.size == 9


def test_uint8_clean_bank_rejects_16bit_clean(tmp_path):
    """clean_dtype=uint8 is lossless only for byte-exact clean frames —
    high-bit-depth clean input must be refused, mirroring the int8 noise
    gate; and the uint8 store must round-trip bit-identically to f32."""
    import jax.numpy as jnp

    from image_denoising_tpu.memory.bank import build_memory_bank

    rng = np.random.default_rng(9)
    clean16 = rng.integers(0, 65536, (24, 24), dtype=np.uint16)
    noise = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    cp, npth = str(tmp_path / "c.tiff"), str(tmp_path / "n.png")
    Image.fromarray(clean16).save(cp)
    Image.fromarray(noise).save(npth)
    with pytest.raises(ValueError, match="uint8-exact clean"):
        build_memory_bank([cp], [npth], patch_size=8, stride=8,
                          clean_dtype="uint8")
    # f32 clean accepts the same data
    bank = build_memory_bank([cp], [npth], patch_size=8, stride=8)
    assert bank.clean.dtype == jnp.float32

    # byte-exact clean: uint8 store decodes to the identical f32 patches
    clean8 = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    cp8 = str(tmp_path / "c8.png")
    Image.fromarray(clean8).save(cp8)
    b32 = build_memory_bank([cp8], [npth], patch_size=8, stride=8)
    b8 = build_memory_bank([cp8], [npth], patch_size=8, stride=8,
                           clean_dtype="uint8")
    assert b8.clean.dtype == jnp.uint8
    from image_denoising_tpu.adapters.wrappers import _clean01

    np.testing.assert_array_equal(np.asarray(_clean01(b8.clean)),
                                  np.asarray(b32.clean))
