import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_denoising_tpu.ckpt import load_checkpoint, save_checkpoint
from image_denoising_tpu.ckpt.io import restore_train_state, save_train_state


def test_roundtrip_params(tmp_path):
    params = {"layer": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4),
                        "bias": np.zeros(4, np.float32)}}
    path = save_checkpoint(params, str(tmp_path), "model", 7)
    assert path.endswith("epoch_model_007.ckpt")
    loaded = load_checkpoint(path)
    np.testing.assert_array_equal(loaded["layer"]["kernel"],
                                  params["layer"]["kernel"])


def test_checkpoint_meta(tmp_path):
    params = {"w": np.ones(3, np.float32)}
    path = save_checkpoint(params, str(tmp_path), "adapter_only", 1,
                           meta={"arch": "UNetImproved", "n_feature": 48})
    import json

    meta = json.load(open(path + ".json"))
    assert meta["arch"] == "UNetImproved"


@pytest.mark.slow
def test_full_train_state_resume(tmp_path):
    """Optimizer moments must survive a save/restore round trip exactly."""
    from image_denoising_tpu.models import UNet
    from image_denoising_tpu.train import create_train_state, make_structure_train_step

    model = UNet(in_nc=1, out_nc=1, n_feature=8)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    state = create_train_state(variables["params"], lr=1e-3)
    step = make_structure_train_step(model.apply)

    rng = np.random.default_rng(0)
    clean = rng.random((2, 32, 32, 1), dtype=np.float32) * 255
    noisy = np.clip(clean + rng.normal(0, 20, clean.shape), 0, 255).astype(np.float32)
    for _ in range(3):
        state, _ = step(state, jnp.asarray(clean), jnp.asarray(noisy))

    path = save_train_state(state, str(tmp_path), 3)

    # fresh template, restore, continue — must equal continuing the original
    variables2 = model.init(jax.random.PRNGKey(0), x)
    template = create_train_state(variables2["params"], lr=1e-3)
    restored = restore_train_state(template, path)
    assert int(restored.step) == 3

    state_a, ma = step(state, jnp.asarray(clean), jnp.asarray(noisy))
    state_b, mb = step(restored, jnp.asarray(clean), jnp.asarray(noisy))
    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-7
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_pth_requires_arch(tmp_path):
    with pytest.raises(ValueError):
        load_checkpoint("whatever.pth")
