"""Spatial-tile parallelism: tile batch sharded over the device mesh must
produce identical frames to the single-device path."""
import numpy as np

import jax
import jax.numpy as jnp

from image_denoising_tpu.eval.tiled import (
    make_tiled_hann_runner,
    make_tiled_pyramid_runner,
)
from image_denoising_tpu.parallel import make_mesh


def _affine(t, *extra):
    return t * 0.8 + 0.05


def test_pyramid_tile_sharded_matches_single(rng):
    noisy = jnp.asarray(rng.integers(0, 256, (96, 96)).astype(np.uint8))
    base = make_tiled_pyramid_runner(_affine, 96, 96, ps=64, overlap=32)
    mesh = make_mesh(8)
    sharded = make_tiled_pyramid_runner(_affine, 96, 96, ps=64, overlap=32,
                                        mesh=mesh)
    out1, l1_1 = base(noisy)
    out2, l1_2 = sharded(noisy)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    assert abs(float(l1_1) - float(l1_2)) < 1e-6


def test_hann_tile_sharded_matches_single(rng):
    noisy = jnp.asarray(rng.integers(0, 256, (96, 130)).astype(np.uint8))
    base = make_tiled_hann_runner(_affine, 96, 130, ps=64, overlap=32)
    mesh = make_mesh(8)
    sharded = make_tiled_hann_runner(_affine, 96, 130, ps=64, overlap=32,
                                     mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(base(noisy)), np.asarray(sharded(noisy)), atol=1e-6
    )


def test_sharded_model_forward_with_params(rng):
    """Tile sharding composes with a real model + runtime params."""
    from image_denoising_tpu.models import UNet

    model = UNet(in_nc=1, out_nc=1, n_feature=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]

    def call(tiles, p):
        return model.apply({"params": p}, tiles)

    noisy = jnp.asarray(rng.integers(0, 256, (96, 96)).astype(np.uint8))
    mesh = make_mesh(8)
    base = make_tiled_pyramid_runner(call, 96, 96, ps=64, overlap=32)
    sharded = make_tiled_pyramid_runner(call, 96, 96, ps=64, overlap=32, mesh=mesh)
    out1, _ = base(noisy, params)
    out2, _ = sharded(noisy, params)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
