"""A-domain trainer CLI — reference-compatible ``train.py``.

Default mode reproduces the reference trainer: full-frame pairs, double
forward (noisy and clean), Structure loss (α·L1 + 0.5·TV + 0.5·consistency),
Adam(3e-4), MultiStepLR γ=0.5 at {20,40,60,80}%·epochs−1, epoch-end checkpoint
+ validation render + A_log.csv.

``--loss n2n`` activates the Neighbor2Neighbor self-supervised path that the
reference documents as the intended strategy (training_script.md) but leaves
dormant: synthetic noise (--noisetype), the random 2×2 mask-pair subsampler,
and the Λ-regularized loss — all fused into one jitted device program.

TPU-native: the whole step (normalize → forward(s) → loss → backward → Adam)
is one XLA program with donated buffers; data parallelism shards the batch
over the device mesh (--parallel uses all visible devices).
"""
from __future__ import annotations

import argparse
import datetime
import os
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--noisetype", type=str, default="gauss25")
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--save_model_path", type=str, default="./results")
    parser.add_argument("--log_name", type=str, default="unet_gauss25_b4e100r02")
    parser.add_argument("--gpu_devices", default="0", type=str)
    parser.add_argument("--parallel", action="store_true",
                        help="shard the batch over all devices in the mesh")
    parser.add_argument("--n_feature", type=int, default=48)
    parser.add_argument("--n_channel", type=int, default=1)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--gamma", type=float, default=0.5)
    parser.add_argument("--n_epoch", type=int, default=100)
    parser.add_argument("--n_snapshot", type=int, default=1)
    parser.add_argument("--batchsize", type=int, default=4)
    parser.add_argument("--Lambda1", type=float, default=1.0)
    parser.add_argument("--Lambda2", type=float, default=1.0)
    parser.add_argument("--increase_ratio", type=float, default=2.0)
    # extensions beyond the reference flag set
    parser.add_argument("--arch", type=str, default=None,
                        help="explicit arch; default = log_name substring dispatch")
    parser.add_argument("--loss", type=str, default="structure",
                        choices=["structure", "n2n"],
                        help="structure = reference train.py; n2n = documented N2N recipe")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_steps_per_epoch", type=int, default=0,
                        help="debug/bench cap; 0 = full epoch")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint to resume params from (the reference "
                             "always restarts at epoch 1; this is an extension)")
    parser.add_argument("--start_epoch", type=int, default=1,
                        help="first epoch number when resuming")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of the first training "
                             "steps of the first epoch to this directory")
    parser.add_argument("--profile_steps", type=int, default=5)
    parser.add_argument("--subsampler", type=str, default="xla",
                        choices=["xla", "pallas"],
                        help="N2N mask-pair source: xla (reproducible "
                             "counter-keys, any backend) or pallas (fused "
                             "on-core PRNG kernel, TPU only)")
    from .common import add_blindspot_flag, add_dtype_flag

    add_blindspot_flag(parser)
    add_dtype_flag(parser)
    parser.add_argument("--remat", action=argparse.BooleanOptionalAction,
                        default=False,
                        help="rematerialize RDB/Res/Up blocks during backward "
                             "(trades FLOPs for HBM). Default OFF: the fused "
                             "batch-8 step at the reference batch-4 352² "
                             "geometry fits a 16 GB v5e without remat and is "
                             "~15-20%% faster (docs/PERF.md §6.1 sweep; the "
                             "torch reference never remats either). Enable "
                             "for larger batches/frames that exceed HBM.")
    parser.add_argument("--remat_depth", type=int, default=None,
                        help="remat only the N highest-resolution levels "
                             "(deep levels keep activations — less recompute "
                             "for little HBM; docs/PERF.md §6). Implies "
                             "--remat. Default: all levels when --remat.")
    opt, _ = parser.parse_known_args(argv)
    if opt.remat_depth is not None:
        # a depth without --remat would silently be a no-op (the model gates
        # on remat AND depth) — asking for a depth IS asking for remat
        opt.remat = True
    return opt


def main(argv=None):
    opt = parse_args(argv)
    systime = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M")

    import jax
    import jax.numpy as jnp

    from ..ckpt import save_checkpoint
    from ..data import DenoiseDataset, validation_denoise
    from ..metrics import calculate_psnr
    from ..ops import AugmentNoise, OperationSeed
    from ..parallel import make_mesh, replicate, shard_batch
    from ..train import (
        create_train_state,
        make_n2n_train_step,
        make_structure_train_step,
        multistep_lr,
        reference_milestones,
        set_learning_rate,
    )
    from .common import build_network, resolve_dtype, save_png

    dataset = DenoiseDataset(opt.data_dir)
    valid = validation_denoise(opt.data_dir)

    network = build_network(opt.arch, opt.log_name, opt.n_channel,
                            opt.n_feature, dtype=resolve_dtype(opt.dtype),
                            remat=opt.remat, remat_depth=opt.remat_depth,
                            blindspot=opt.blindspot)

    # infer frame geometry from the first pair for init
    c0, n0 = dataset.get(0)
    init_x = jnp.zeros((1,) + c0.shape, jnp.float32)
    variables = jax.jit(network.init)(jax.random.PRNGKey(opt.seed), init_x)
    params = variables["params"]
    if opt.resume:
        from ..ckpt import load_checkpoint
        from .common import _arch_name

        params = load_checkpoint(opt.resume, arch=_arch_name(network))
        print(f"Resumed params from {opt.resume}")

    mesh = None
    if opt.parallel:
        mesh = make_mesh()
        params = replicate(mesh, params)
        print(f"data-parallel over {len(jax.devices())} devices")

    state = create_train_state(params, lr=opt.lr)
    milestones = reference_milestones(opt.n_epoch)

    if opt.loss == "structure":
        step_fn = make_structure_train_step(network.apply, alpha=opt.Lambda1)
    else:
        aug = AugmentNoise(opt.noisetype)
        step_fn = make_n2n_train_step(
            network.apply, noise_fn=aug.add_train_noise,
            increase_ratio=opt.increase_ratio, n_epoch=opt.n_epoch,
            subsampler=opt.subsampler,
            lambda1=opt.Lambda1, lambda2=opt.Lambda2,
        )
    opkeys = OperationSeed(opt.seed)

    save_model_path = os.path.join(opt.save_model_path, opt.log_name, systime)
    save_checkpoint(state.params, save_model_path, "model", 0)
    print("init finish")
    print(f"Batchsize={opt.batchsize}, number of epoch={opt.n_epoch}")

    rng = np.random.default_rng(opt.seed)
    profiling = False
    # one compiled validation forward reused across snapshot epochs — params
    # as an ARGUMENT, not a baked closure constant (a fresh jit per epoch
    # would recompile the full-frame program every snapshot)
    val_fwd = jax.jit(lambda p, x: network.apply({"params": p}, x))

    def flush_metrics(p):
        # reference log format: Loss1 = plain L1(net(noisy), clean)
        # (train.py:369-373); the n2n path reports its rec term instead.
        # The epoch mean + A_log.csv record the L1 component, not the full
        # structure loss (train.py:365-377,434).
        # Time semantics under lag-1: spans step i's prep start → its metric
        # fetch, which lands AFTER step i+1 is dispatched — so it includes
        # i+1's host prep/dispatch (~ms) on top of step i's wall. At steady
        # state it reads the pipelined per-step interval, NOT the reference's
        # synchronous step time; loss values and ordering are identical.
        ep, i, st0, m = p
        loss = float(m["loss"])
        l1_part = float(m.get("l1", m.get("loss_rec", loss)))
        losses.append(l1_part)
        print(
            f"{ep:04d} {i:05d} Loss1={l1_part:.6f}, "
            f"Loss_Full={loss:.6f}, Time={time.time() - st0:.4f}"
        )

    for epoch in range(opt.start_epoch, opt.n_epoch + 1):
        epoch_st = time.time()
        lr = multistep_lr(opt.lr, milestones, opt.gamma, epoch)
        state = set_learning_rate(state, lr)
        print(f"LearningRate of Epoch {epoch} = {lr}")

        losses = []
        pending = None
        for it, (clean, noisy) in enumerate(
            dataset.batches(opt.batchsize, rng, shuffle=True, drop_last=True)
        ):
            if opt.max_steps_per_epoch and it >= opt.max_steps_per_epoch:
                break
            if opt.profile_dir and epoch == opt.start_epoch and it == 0:
                jax.profiler.start_trace(opt.profile_dir)
                profiling = True
            if profiling and it == opt.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                print(f"profiler trace written to {opt.profile_dir}")
            st = time.time()
            batch = (clean, noisy)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            if opt.loss == "structure":
                state, metrics = step_fn(state, batch[0], batch[1])
            else:
                state, metrics = step_fn(
                    state, batch[0], batch[1], opkeys.next(),
                    jnp.asarray(epoch, jnp.int32),
                )
            # lag-1 pipelined logging: fetch the PREVIOUS step's metrics
            # only after dispatching this one, so host batch prep + H2D
            # overlap the in-flight device step (a synchronous per-step
            # fetch serializes the loop on the device round trip). Same
            # log lines, emitted one iteration later.
            if pending is not None:
                flush_metrics(pending)
            pending = (epoch, it, st, metrics)
        if pending is not None:
            flush_metrics(pending)

        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profiler trace written to {opt.profile_dir}")

        train_time = time.time() - epoch_st
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        print(f"Training Time/Epoch:{train_time} \n Mean loss:{mean_loss}")

        if epoch % opt.n_snapshot == 0 or epoch == opt.n_epoch:
            eval_st = time.time()
            save_checkpoint(state.params, save_model_path, "model", epoch)
            validation_path = os.path.join(save_model_path, "validation")
            os.makedirs(validation_path, exist_ok=True)

            for i in range(len(valid[0])):
                clean_np, noisy_np = valid[0][i], valid[1][i]
                clean_name = os.path.basename(valid[2][i]).split(".")[0]
                noise_name = os.path.basename(valid[3][i]).split(".")[0]
                x = np.asarray(noisy_np, np.float32) / 255.0
                if x.ndim == 2:
                    x = x[..., None]
                pred = np.asarray(val_fwd(state.params, jnp.asarray(x)[None])[0])
                pred = np.clip(pred, 0, 1).squeeze()
                pred255 = np.clip(pred * 255.0 + 0.5, 0, 255).astype(np.uint8)

                if i == 0 and epoch == opt.n_snapshot:
                    save_png(np.asarray(clean_np).astype(np.uint8),
                             os.path.join(validation_path,
                                          f"{clean_name}_{i:03d}-{epoch:03d}_clean.png"))
                    save_png(np.asarray(noisy_np).astype(np.uint8),
                             os.path.join(validation_path,
                                          f"{noise_name}_{i:03d}-{epoch:03d}_noisy.png"))
                if i == 0:
                    save_png(pred255,
                             os.path.join(validation_path,
                                          f"{noise_name}_{i:03d}-{epoch:03d}_denoised.png"))

            with open(os.path.join(validation_path, "A_log.csv"), "a") as f:
                f.write(f"epoch{epoch}, loss_{mean_loss}, train_time_{train_time}\n")
            print(f"Evaluation Time/Epoch:{time.time() - eval_st}")

    return state


if __name__ == "__main__":
    main()
