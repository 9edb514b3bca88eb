"""Memory-adapter finetune CLI — reference-compatible ``finetune_memory.py``.

T5: memory bank built from the first --num_memory_images pairs (patch
--patch_size, stride --memory_stride), frozen base + DenoiserWithMemoryAdapter
(v5 hyper-gated FFT adapter by default, selectable via --adapter_variant
instead of the reference's edit-the-constructor switch), loss
L1 + λ_grad·grad + λ_iqsl·IQSL. Saves adapter-only checkpoints. Validation =
Hann²-blended patchwise full-frame inference (overlap = patch_size // 2).
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
    parser.add_argument("--log_name", type=str, default="UNetImproved_memory_adapter_ft")
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
    parser.add_argument("--num_memory_images", type=int, default=5)
    parser.add_argument("--memory_stride", type=int, default=64)
    parser.add_argument("--lambda_iqsl", type=float, default=0.1)
    parser.add_argument("--iqsl_q1", type=float, default=0.2)
    parser.add_argument("--iqsl_q2", type=float, default=0.8)
    parser.add_argument("--iqsl_tau", type=float, default=0.1)
    parser.add_argument("--iqsl_margin", type=float, default=0.0)
    parser.add_argument("--iqsl_max_images", type=int, default=50)
    parser.add_argument("--iqsl_ce_factor", type=float, default=0.5)
    parser.add_argument("--adapter_variant", type=str, default="hyper_gated_fft",
                        choices=["memory_residual", "lowfreq_blend", "tone_curve",
                                 "hyper_gated", "hyper_gated_fft"],
                        help="v1–v5; the reference hard-codes v5")
    parser.add_argument("--pallas_retrieval", action="store_true",
                        help="stream the bank through VMEM (Pallas kernel) "
                             "instead of materializing the [B,N] distance matrix")
    parser.add_argument("--bank_sharded", action="store_true",
                        help="shard BOTH banks over the device mesh and "
                             "retrieve with the ring (ppermute) kernel during "
                             "training AND Hann validation — per-chip bank "
                             "HBM drops to 1/k (the production stride-4 "
                             "regime: ~10.3 GB f32 banks). Gradients flow "
                             "only to the adapter, so the ring stays "
                             "inference-only inside the step. Composes with "
                             "--parallel (batch DP).")
    parser.add_argument("--bank_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16", "int8"],
                        help="noise-bank storage dtype. bf16 halves HBM; "
                             "int8 quarters it AND computes exact integer "
                             "distances on the MXU's double-rate int8 path "
                             "(uint8-sourced patches; composes with "
                             "--pallas_retrieval)")
    parser.add_argument("--clean_bank_dtype", type=str, default="float32",
                        choices=["float32", "uint8"],
                        help="clean-bank storage dtype. uint8 stores the "
                             "source bytes (LOSSLESS for uint8 frames — the "
                             "post-gather /255 restores the exact floats) at "
                             "4x less HBM: the production stride-4 clean "
                             "bank drops 6.9 -> 1.7 GB")
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

    from ..adapters import DenoiserWithMemoryAdapter
    from ..ckpt import load_checkpoint, save_checkpoint
    from ..data import DenoisePatchDataset, list_pairs, validation_denoise
    from ..eval import denoise_tiled_hann
    from ..losses import estimate_intensity_thresholds
    from ..memory import build_memory_bank
    from ..metrics import calculate_psnr
    from ..models.registry import build_model
    from ..train import create_train_state
    from ..train.finetune_steps import make_memory_finetune_step
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

    clean_all, noise_all = list_pairs(opt.data_dir)
    num_mem = min(opt.num_memory_images, len(clean_all))
    bank = build_memory_bank(
        clean_all[:num_mem], noise_all[:num_mem],
        patch_size=opt.patch_size, stride=opt.memory_stride,
        bank_dtype=opt.bank_dtype,
        clean_dtype=opt.clean_bank_dtype,
        pad_to=512 if opt.pallas_retrieval else 0,
    )

    from .common import resolve_dtype

    base = build_model(opt.arch, opt.n_channel, opt.n_feature,
                       dtype=resolve_dtype(getattr(opt, "dtype", None)))
    base_params = load_checkpoint(opt.pretrained_ckpt, arch=opt.arch)
    print(f"Loaded base weights from {opt.pretrained_ckpt}")

    mesh = None
    retrieval_fn = None
    if opt.parallel or opt.bank_sharded:
        from ..parallel import make_mesh, replicate

        mesh = make_mesh()
        if opt.parallel:
            base_params = replicate(mesh, base_params)
            print(f"data-parallel over {len(jax.devices())} devices")
    if opt.bank_sharded:
        from ..memory import make_ring_retrieval, shard_bank

        # training batches (and the Hann validation's tile chunks) are small
        # and replicated; only the BANKS shard — each device scans its 1/k
        # shard and the shards rotate around the ring (ref behavior being
        # scaled: finetune_memory.py:1256-1277)
        bank = shard_bank(bank, mesh, "data")
        retrieval_fn = make_ring_retrieval(mesh, "data", queries_sharded=False)
        print(f"memory bank sharded over {mesh.devices.size} devices "
              f"(~{bank.noise_flat.nbytes // mesh.devices.size / 1e6:.1f} MB "
              f"noise bank per device)")
        if opt.parallel:
            print("[bank_sharded] training batch stays replicated (the ring "
                  "replicates queries; only banks shard) — --parallel adds "
                  "no batch DP here")

    wrapper = DenoiserWithMemoryAdapter(
        base=base, in_channels=opt.n_channel,
        hidden_channels=opt.adapter_hidden, variant=opt.adapter_variant,
        pallas_retrieval=opt.pallas_retrieval,
        retrieval_fn=retrieval_fn,
    )

    init_x = jnp.zeros((1, opt.patch_size, opt.patch_size, opt.n_channel))
    if opt.bank_sharded:
        # the ring retrieval's shard_map needs the real (sharded) bank shape
        init_banks = (bank.noise_flat, bank.clean, bank.sq_norms)
    else:
        init_banks = (bank.noise_flat[:1], bank.clean[:1], bank.sq_norms[:1])
    variables = jax.jit(wrapper.init)(
        jax.random.PRNGKey(opt.seed), init_x, *init_banks,
    )
    state = create_train_state(variables["params"]["adapter"], lr=opt.lr)

    step = make_memory_finetune_step(
        wrapper.apply, lambda_grad=opt.lambda_grad, lambda_iqsl=opt.lambda_iqsl,
        iqsl_cfg={"t1": t1, "t2": t2, "tau": opt.iqsl_tau,
                  "margin": opt.iqsl_margin, "ce_factor": opt.iqsl_ce_factor},
    )

    print(
        f"==> Start finetuning with MEMORY adapter + patches + IQSL. "
        f"Num epochs={opt.n_epoch}, batchsize={opt.batchsize}, lr={opt.lr}, "
        f"lambda_grad={opt.lambda_grad}, lambda_iqsl={opt.lambda_iqsl}, "
        f"patch_size={opt.patch_size}, patches_per_image={opt.patches_per_image}, "
        f"num_memory_images={num_mem}, memory_stride={opt.memory_stride}, "
        f"adapter_variant={opt.adapter_variant}"
    )

    save_root = os.path.join(opt.save_model_path, opt.log_name)
    rng = np.random.default_rng(opt.seed)

    # stable callables for the tiled-eval runner cache; params/banks flow as
    # runtime args so validation never recompiles across epochs. Validation
    # hoists retrieval out of the tile scan (one bank pass per frame in
    # 128-query chunks, patches as extra channels — see the memory eval CLI);
    # the ring path retrieves inside the forward by construction.
    if retrieval_fn is None:
        from ..adapters import batched_select_memory_patch

        _c = opt.n_channel

        def val_pre_tile_fn(tiles, adapter_params, bank_noise, bank_clean,
                            bank_norms):
            mem = batched_select_memory_patch(
                tiles, bank_noise, bank_clean, bank_norms,
                use_pallas=opt.pallas_retrieval,
            )
            return jnp.concatenate([tiles, mem.astype(tiles.dtype)], axis=-1)

        def model_call(stack, adapter_params, bank_noise, bank_clean,
                       bank_norms):
            return wrapper.apply(
                {"params": {"base": base_params, "adapter": adapter_params}},
                stack[..., :_c], bank_noise, bank_clean, bank_norms,
                mem_clean=stack[..., _c:],
            )
    else:
        val_pre_tile_fn = None

        def model_call(tiles, adapter_params, bank_noise, bank_clean, bank_norms):
            return wrapper.apply(
                {"params": {"base": base_params, "adapter": adapter_params}},
                tiles, bank_noise, bank_clean, bank_norms,
            )

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
            if opt.parallel and not opt.bank_sharded:
                # batch DP only without a sharded bank: the ring replicates
                # its (small) query batch by design (queries_sharded=False —
                # only the BANKS shard); sharding the batch here would force
                # a per-step reshard inside the jitted step and contradict
                # the placement the sharded-vs-replicated equality test pins.
                from ..parallel import shard_batch

                batch = shard_batch(mesh, batch)
            state, metrics = step(
                state, base_params, jnp.asarray(batch[0]), jnp.asarray(batch[1]),
                bank.noise_flat, bank.clean, bank.sq_norms,
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

            for i, (clean_np, noisy_np) in enumerate(zip(valid[0], valid[1])):
                noisy_name = os.path.basename(valid[3][i]).split(".")[0]
                pred = denoise_tiled_hann(
                    model_call, np.asarray(noisy_np),
                    ps=opt.patch_size, overlap=opt.patch_size // 2,
                    batch=-8,  # sublane-filling tile chunks (docs/PERF.md)
                    extra=(state.params, bank.noise_flat, bank.clean, bank.sq_norms),
                    pre_tile_fn=val_pre_tile_fn,
                )
                pred255 = np.clip(pred * 255.0 + 0.5, 0, 255).astype(np.uint8)
                psnr = calculate_psnr(pred255.squeeze(-1), clean_np)
                if i == min(6, len(valid[0]) - 1):
                    print(f"Val ep{epoch}: psnr={psnr:.2f} dB")
                    save_png(pred255.squeeze(-1),
                             os.path.join(save_dir,
                                          f"{noisy_name}_denoised_full_ep{epoch:03d}.png"),
                             mode="L")

    print("Finetuning (memory adapter) complete.")
    return state


if __name__ == "__main__":
    main()
