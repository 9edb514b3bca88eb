"""Adapter finetune + IQSL CLI — reference-compatible ``finetune_iqsl.py``.

Extends the plain adapter finetune with the Intensity-Quantized Structural
Loss: thresholds (t1, t2) pre-estimated as global quantiles of the clean set,
loss = L1 + λ_grad·gradient + λ_iqsl·IQSL. Saves the ADAPTER-ONLY state as
``epoch_adapter_only_{e:03d}`` (reference role, finetune_iqsl.py:114-132).
Validation uses the first 10 pairs (reference quirk, finetune_iqsl.py:218).
"""
from __future__ import annotations

import argparse
import datetime
import os
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--pretrained_ckpt", type=str, required=True)
    parser.add_argument("--arch", type=str, default="UNetImproved",
                        choices=["UNet", "RESNET", "UNetImproved"])
    parser.add_argument("--save_model_path", type=str, default="./results_ft")
    parser.add_argument("--log_name", type=str, default="UNetImproved_adapter_iqsl_ft")
    parser.add_argument("--gpu_devices", default="0", type=str)
    parser.add_argument("--parallel", action="store_true")
    parser.add_argument("--n_feature", type=int, default=48)
    parser.add_argument("--n_channel", type=int, default=1)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--n_epoch", type=int, default=20)
    parser.add_argument("--batchsize", type=int, default=4)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--adapter_hidden", type=int, default=16)
    parser.add_argument("--lambda_grad", type=float, default=0.1)
    parser.add_argument("--save_every", type=int, default=1)
    parser.add_argument("--patch_size", type=int, default=128)
    parser.add_argument("--patches_per_image", type=int, default=16)
    parser.add_argument("--lambda_iqsl", type=float, default=0.1)
    parser.add_argument("--iqsl_q1", type=float, default=0.2)
    parser.add_argument("--iqsl_q2", type=float, default=0.8)
    parser.add_argument("--iqsl_tau", type=float, default=0.1)
    parser.add_argument("--iqsl_margin", type=float, default=0.0)
    parser.add_argument("--iqsl_max_images", type=int, default=50)
    parser.add_argument("--iqsl_ce_factor", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=0)
    from .common import add_dtype_flag

    add_dtype_flag(parser)
    args, _ = parser.parse_known_args(argv)
    return args


def main(argv=None):
    opt = parse_args(argv)
    systime = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M")

    import jax
    import jax.numpy as jnp

    from ..adapters import DenoiserWithAdapter
    from ..ckpt import load_checkpoint, save_checkpoint
    from ..data import DenoisePatchDataset, validation_denoise
    from ..losses import estimate_intensity_thresholds
    from ..metrics import calculate_psnr
    from ..models.registry import build_model
    from ..train import create_train_state
    from ..train.finetune_steps import make_adapter_finetune_step
    from .common import save_png

    train_dataset = DenoisePatchDataset(
        opt.data_dir, patch_size=opt.patch_size,
        patches_per_image=opt.patches_per_image,
    )
    valid = validation_denoise(opt.data_dir, limit=10)

    if opt.lambda_iqsl > 0.0:
        t1, t2 = estimate_intensity_thresholds(
            opt.data_dir, q1=opt.iqsl_q1, q2=opt.iqsl_q2,
            max_images=opt.iqsl_max_images,
        )
        print(f"[IQSL] Estimated thresholds from clean/: t1={t1:.6f}, t2={t2:.6f}")
    else:
        t1 = t2 = 0.0
        print("[IQSL] lambda_iqsl=0 → IQSL disabled.")

    from .common import resolve_dtype

    base = build_model(opt.arch, opt.n_channel, opt.n_feature,
                       dtype=resolve_dtype(getattr(opt, "dtype", None)))
    base_params = load_checkpoint(opt.pretrained_ckpt, arch=opt.arch)
    print(f"Loaded base weights from {opt.pretrained_ckpt}")

    wrapper = DenoiserWithAdapter(
        base=base, in_channels=opt.n_channel, hidden_channels=opt.adapter_hidden
    )
    init_x = jnp.zeros((1, opt.patch_size, opt.patch_size, opt.n_channel))
    variables = jax.jit(wrapper.init)(jax.random.PRNGKey(opt.seed), init_x)

    mesh = None
    if opt.parallel:
        from ..parallel import make_mesh, replicate

        mesh = make_mesh()
        base_params = replicate(mesh, base_params)
        variables = replicate(mesh, variables)
        print(f"data-parallel over {len(jax.devices())} devices")
    state = create_train_state(variables["params"]["adapter"], lr=opt.lr)

    step = make_adapter_finetune_step(
        wrapper.apply, lambda_grad=opt.lambda_grad, lambda_iqsl=opt.lambda_iqsl,
        iqsl_cfg={"t1": t1, "t2": t2, "tau": opt.iqsl_tau,
                  "margin": opt.iqsl_margin, "ce_factor": opt.iqsl_ce_factor},
    )

    save_root = os.path.join(opt.save_model_path, opt.log_name)
    rng = np.random.default_rng(opt.seed)
    for epoch in range(1, opt.n_epoch + 1):
        epoch_st = time.time()
        losses_l1, losses_iqsl = [], []
        pending = None  # lag-1 metric fetch: overlap host prep with the step

        def flush(p):
            i, m = p
            losses_l1.append(float(m["l1"]))
            losses_iqsl.append(float(m["iqsl"]))
            if i % 10 == 0:
                print(
                    f"Epoch [{epoch}/{opt.n_epoch}] Iter [{i}] "
                    f"L1={float(m['l1']):.6f} "
                    f"Grad={float(m['grad']):.6f} "
                    f"IQSL={float(m['iqsl']):.6f} "
                    f"Total={float(m['loss']):.6f}"
                )

        for i, (clean, noisy) in enumerate(
            train_dataset.batches(opt.batchsize, rng), start=1
        ):
            batch = (clean, noisy)
            if mesh is not None:
                from ..parallel import shard_batch

                batch = shard_batch(mesh, batch)
            state, metrics = step(
                state, base_params, jnp.asarray(batch[0]), jnp.asarray(batch[1])
            )
            if pending is not None:
                flush(pending)
            pending = (i, metrics)
        if pending is not None:
            flush(pending)

        print(
            f"End of epoch {epoch}, mean L1={np.mean(losses_l1):.6f}, "
            f"mean IQSL={np.mean(losses_iqsl):.6f}, "
            f"time={time.time() - epoch_st:.2f}s"
        )

        if epoch % opt.save_every == 0 or epoch == opt.n_epoch:
            save_checkpoint(state.params, save_root, "adapter_only", epoch)

            save_dir = os.path.join(save_root, f"val_{systime}_ep{epoch:03d}")
            os.makedirs(save_dir, exist_ok=True)
            full_params = {"base": base_params, "adapter": state.params}

            @jax.jit
            def fwd(params, x):
                return wrapper.apply({"params": params}, x)

            for i, (clean_np, noisy_np) in enumerate(zip(valid[0], valid[1])):
                noisy_name = os.path.basename(valid[3][i]).split(".")[0]
                x = np.asarray(noisy_np, np.float32) / 255.0
                if x.ndim == 2:
                    x = x[..., None]
                pred = np.asarray(fwd(full_params, jnp.asarray(x)[None])[0])
                pred255 = np.clip(pred * 255.0 + 0.5, 0, 255).astype(np.uint8)
                psnr = calculate_psnr(pred255.squeeze(), clean_np)
                if i == 0:
                    print(f"Val ep{epoch}: psnr={psnr:.2f} dB")
                    save_png(pred255.squeeze(),
                             os.path.join(save_dir,
                                          f"{noisy_name}_denoised_ep{epoch:03d}.png"),
                             mode="L")

    print("Finetuning (IQSL adapter) complete.")
    return state


if __name__ == "__main__":
    main()
