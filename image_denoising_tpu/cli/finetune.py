"""Adapter finetune CLI — reference-compatible ``finetune.py``.

B-domain transfer: frozen A-domain base + small trainable OutputAdapter on
random 128-px patch pairs (first 5 images), loss L1 + λ_grad·gradient,
Adam(1e-4). Saves the FULL wrapper state as ``epoch_adapter_{e:03d}`` each
epoch (reference role semantics) and runs whole-frame validation with PSNR.
"""
from __future__ import annotations

import argparse
import datetime
import os
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True,
                        help="B-domain root with clean/ and noise/ subfolders.")
    parser.add_argument("--pretrained_ckpt", type=str, required=True,
                        help="A-domain base checkpoint (.ckpt or .pth)")
    parser.add_argument("--arch", type=str, default="UNetImproved",
                        choices=["UNet", "RESNET", "UNetImproved"])
    parser.add_argument("--save_model_path", type=str, default="./results_ft")
    parser.add_argument("--log_name", type=str, default="UNetImproved_adapter_ft")
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
    from ..metrics import calculate_psnr
    from ..models.registry import build_model
    from ..train import create_train_state
    from ..train.finetune_steps import make_adapter_finetune_step
    from .common import save_png

    train_dataset = DenoisePatchDataset(
        opt.data_dir, patch_size=opt.patch_size,
        patches_per_image=opt.patches_per_image,
    )
    valid = validation_denoise(opt.data_dir)

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
    adapter_params = variables["params"]["adapter"]

    state = create_train_state(adapter_params, lr=opt.lr)
    step = make_adapter_finetune_step(wrapper.apply, lambda_grad=opt.lambda_grad)

    print(
        f"==> Start finetuning with adapter + patches. Num epochs={opt.n_epoch}, "
        f"batchsize={opt.batchsize}, lr={opt.lr}, lambda_grad={opt.lambda_grad}, "
        f"patch_size={opt.patch_size}, patches_per_image={opt.patches_per_image}"
    )

    save_root = os.path.join(opt.save_model_path, opt.log_name)
    rng = np.random.default_rng(opt.seed)
    fwd = None
    for epoch in range(1, opt.n_epoch + 1):
        epoch_st = time.time()
        losses = []
        pending = None  # lag-1 metric fetch: overlap host prep with the step

        def flush(p):
            i, m = p
            losses.append(float(m["l1"]))
            if i % 10 == 0:
                print(
                    f"Epoch [{epoch}/{opt.n_epoch}] Iter [{i}] "
                    f"L1={float(m['l1']):.6f} "
                    f"Grad={float(m['grad']):.6f} "
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

        mean_loss = float(np.mean(losses))
        print(
            f"End of epoch {epoch}, mean L1 loss={mean_loss:.6f}, "
            f"time={time.time() - epoch_st:.2f}s"
        )

        if epoch % opt.save_every == 0 or epoch == opt.n_epoch:
            full_params = {"base": base_params, "adapter": state.params}
            save_checkpoint(full_params, save_root, "adapter", epoch)

            save_dir = os.path.join(save_root, f"val_{systime}_ep{epoch:03d}")
            os.makedirs(save_dir, exist_ok=True)
            if fwd is None:
                @jax.jit
                def fwd(params, x):
                    return wrapper.apply({"params": params}, x)

            for i, (clean_np, noisy_np) in enumerate(zip(valid[0], valid[1])):
                clean_name = os.path.basename(valid[2][i]).split(".")[0]
                noisy_name = os.path.basename(valid[3][i]).split(".")[0]
                x = np.asarray(noisy_np, np.float32) / 255.0
                if x.ndim == 2:
                    x = x[..., None]
                pred = np.asarray(fwd(full_params, jnp.asarray(x)[None])[0])
                pred255 = np.clip(pred * 255.0 + 0.5, 0, 255).astype(np.uint8)
                psnr = calculate_psnr(pred255.squeeze(), clean_np)
                if i == 0:
                    print(f"Val ep{epoch}: psnr={psnr:.2f} dB")
                    save_png(np.asarray(clean_np).astype(np.uint8),
                             os.path.join(save_dir, f"{clean_name}_clean.png"), mode="L")
                    save_png(np.asarray(noisy_np).astype(np.uint8),
                             os.path.join(save_dir, f"{noisy_name}_noisy.png"), mode="L")
                    save_png(pred255.squeeze(),
                             os.path.join(save_dir,
                                          f"{noisy_name}_denoised_ep{epoch:03d}.png"),
                             mode="L")

    print("Finetuning complete.")
    return state


if __name__ == "__main__":
    main()
