"""HPO trainer CLI — reference-compatible ``train_opt.py``.

Reproduces the reference's Optuna flow with the framework's native HPO engine
(``image_denoising_tpu.hpo`` — Optuna is not available in all environments):

* deterministic seeding (seed 2025, per-trial ``SEED + trial.number``),
* search space: n_feature ∈ [16,128] step 16, lr ∈ log[1e-6, 3e-4],
* guarded L1 training (non-finite / loss>5 / grad-norm skip, clip 1.0,
  Adam weight_decay 1e-5 with coupled-L2 torch semantics),
* SQLite study storage (resumable via load_if_exists) + trials.log JSONL,
* per-trial init-weight snapshots with a w0_sum checksum,
* final retrain restoring the best trial's seed/init weights, MultiStepLR
  at {0.5, 0.75}·n_epoch, ``epoch_final`` checkpoints, A_log.csv, and
  every-10-epoch inference renders.

Trial parallelism: the reference round-robins trials across 4 GPUs; on a TPU
host trials run one per device (``--n_jobs``), sequential by default.
"""
from __future__ import annotations

import argparse
import datetime
import json
import os
import time

import numpy as np

SEED = 2025


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--noisetype", type=str, default="gauss25")
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--save_model_path", type=str, default="./results")
    parser.add_argument("--log_name", type=str, default="UNetImproved")
    parser.add_argument("--gpu_devices", default="0", type=str)
    parser.add_argument("--parallel", action="store_true")
    parser.add_argument("--n_epoch", type=int, default=20)
    parser.add_argument("--n_snapshot", type=int, default=1)
    parser.add_argument("--batchsize", type=int, default=4)
    parser.add_argument("--n_trials", type=int, default=4)
    parser.add_argument("--tune_epochs", type=int, default=1)
    parser.add_argument("--n_jobs", type=int, default=1)
    parser.add_argument("--storage", type=str, default="sqlite:///optuna_unet.db")
    parser.add_argument("--trials_log", type=str, default="trials.log")
    parser.add_argument("--n_channel", type=int, default=1)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    systime = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M")

    import jax
    import jax.numpy as jnp

    from ..ckpt import save_checkpoint
    from ..ckpt.io import np_tree
    from ..data import DenoiseDataset
    from ..hpo import create_study
    from ..models import ImprovedUNet
    from ..train import (
        create_train_state,
        hpo_milestones,
        make_l1_train_step,
        multistep_lr,
        set_learning_rate,
    )
    from .common import save_png

    ds = DenoiseDataset(args.data_dir, convert_l=True)
    print(f"Found {len(ds)} samples")

    snap_dir = os.path.join(args.save_model_path, args.log_name, systime,
                            "trial_init_snapshots")
    os.makedirs(snap_dir, exist_ok=True)

    def train_epochs(n_feature: int, lr: float, seed: int, epochs: int,
                     milestones, record_state: bool = False):
        """Guarded L1 training for ``epochs``; returns (last_loss, state, model)."""
        model = ImprovedUNet(in_nc=args.n_channel, out_nc=args.n_channel,
                             n_feature=n_feature)
        c0, _ = ds.get(0)
        init_x = jnp.zeros((1,) + c0.shape, jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(seed), init_x)
        state = create_train_state(variables["params"], lr=lr, weight_decay=1e-5)
        step = make_l1_train_step(model.apply, guards=True, grad_clip=1.0,
                                  inputs_01=False)

        rng = np.random.default_rng(seed)
        last_loss = None
        for epoch in range(1, epochs + 1):
            state = set_learning_rate(
                state, multistep_lr(lr, milestones, 0.5, epoch)
            )
            total, batches = 0.0, 0
            for clean, noisy in ds.batches(args.batchsize, rng, shuffle=True,
                                           drop_last=False):
                state, m = step(state, jnp.asarray(clean), jnp.asarray(noisy))
                if bool(m["ok"]):
                    total += float(m["loss"])
                batches += 1
            last_loss = total / max(1, batches)
        return last_loss, state, model

    _placement_probe = jax.jit(lambda: jnp.zeros(()))

    def objective(trial):
        init_seed = SEED + trial.number
        trial.set_user_attr("init_seed", int(init_seed))

        # per-trial device round-robin — the reference pins each Optuna trial
        # to a GPU via trial.number % len(GPUS) + torch.cuda.set_device
        # (train_opt.py:209-219); the JAX equivalent scopes the whole trial
        # under jax.default_device so with --n_jobs > 1 concurrent trials
        # actually run on distinct chips (the context is thread-local).
        devices = jax.devices()
        dev = devices[trial.number % len(devices)]

        n_feature = trial.suggest_int("n_feature", 16, 128, step=16)
        lr = trial.suggest_loguniform("lr", 1e-6, 3e-4)
        tune_epochs = max(1, args.tune_epochs)

        with jax.default_device(dev):
            # record the device the computation ACTUALLY landed on, not the
            # request (replaces the round-2 hardcoded 0). The probe is a
            # single shared jitted fn (one cache entry per device, not per
            # trial — each new jit lambda would compile + round-trip per
            # trial, expensive on a slow-dispatch backend).
            probe = _placement_probe()
            trial.set_user_attr("device", int(next(iter(probe.devices())).id))

            # init snapshot for exact reproducibility of the final retrain
            model = ImprovedUNet(in_nc=args.n_channel, out_nc=args.n_channel,
                                 n_feature=n_feature)
            c0, _ = ds.get(0)
            init_x = jnp.zeros((1,) + c0.shape, jnp.float32)
            variables = jax.jit(model.init)(jax.random.PRNGKey(init_seed), init_x)
            save_checkpoint(variables["params"], snap_dir,
                            f"trial{trial.number}_init", 0)
            trial.set_user_attr(
                "init_weight_path",
                os.path.join(snap_dir, f"epoch_trial{trial.number}_init_000.ckpt"),
            )
            w0 = jax.tree_util.tree_leaves(np_tree(variables["params"]))[0]
            trial.set_user_attr("w0_sum", float(np.sum(w0)))

            loss, _, _ = train_epochs(
                n_feature, lr, init_seed, tune_epochs, hpo_milestones(tune_epochs)
            )
        return float(loss)

    def json_logger(study, trial):
        rec = {
            "trial": trial.number,
            "value": trial.value,
            "params": trial.params,
            "completed": trial.datetime_complete.isoformat(),
            "init_seed": int(trial.user_attrs.get("init_seed", -1)),
            "device": int(trial.user_attrs.get("device", -1)),
        }
        with open(args.trials_log, "a") as f:
            f.write(json.dumps(rec) + "\n")

    study = create_study(study_name="unet_opt", storage=args.storage,
                         load_if_exists=True, direction="minimize")
    study.optimize(objective, n_trials=args.n_trials, n_jobs=args.n_jobs,
                   callbacks=[json_logger])

    best = study.best_trial.params
    print("Best hyperparams:", best)

    # ── final retrain with best-trial parity ────────────────────────────────
    best_seed = int(study.best_trial.user_attrs.get("init_seed", SEED))

    save_dir = os.path.join(args.save_model_path, args.log_name, systime)
    validation_path = os.path.join(save_dir, "validation")
    os.makedirs(validation_path, exist_ok=True)
    log_path = os.path.join(validation_path, "A_log.csv")
    with open(log_path, "a") as f:
        f.write("epoch, loss, train_time\n")

    model = ImprovedUNet(in_nc=args.n_channel, out_nc=args.n_channel,
                         n_feature=best["n_feature"])
    c0, _ = ds.get(0)
    init_x = jnp.zeros((1,) + c0.shape, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(best_seed), init_x)

    init_w_path = study.best_trial.user_attrs.get("init_weight_path")
    params = variables["params"]
    if init_w_path and os.path.isfile(init_w_path):
        from ..ckpt import load_checkpoint

        params = load_checkpoint(init_w_path)
        w0 = jax.tree_util.tree_leaves(np_tree(params))[0]
        print(f"[repro] loaded init snapshot; w0_sum={np.sum(w0):.6f} "
              f"vs trial {study.best_trial.user_attrs.get('w0_sum')}")
    else:
        print("[repro] init snapshot not found; using seeded init.")

    state = create_train_state(params, lr=best["lr"], weight_decay=1e-5)
    step = make_l1_train_step(model.apply, guards=True, grad_clip=1.0,
                              inputs_01=False)
    milestones = [int(0.5 * args.n_epoch), int(0.75 * args.n_epoch)]

    rng = np.random.default_rng(best_seed)
    for epoch in range(1, args.n_epoch + 1):
        start = time.time()
        state = set_learning_rate(
            state, multistep_lr(best["lr"], milestones, 0.5, epoch)
        )
        total, batches = 0.0, 0
        for clean, noisy in ds.batches(args.batchsize, rng, shuffle=True,
                                       drop_last=False):
            state, m = step(state, jnp.asarray(clean), jnp.asarray(noisy))
            if bool(m["ok"]):
                total += float(m["loss"])
            batches += 1
        loss = total / max(1, batches)
        train_time = time.time() - start
        print(f"Epoch {epoch}: loss={loss:.4f}, time={train_time:.1f}s")

        if epoch % args.n_snapshot == 0 or epoch == args.n_epoch:
            save_checkpoint(state.params, save_dir, "final", epoch)
        with open(log_path, "a") as f:
            f.write(f"{epoch}, {loss}, {train_time}\n")

        if epoch % 10 == 0:
            clean_img, noisy_img = ds.get(0)
            x = jnp.asarray(noisy_img / 255.0, jnp.float32)[None]
            pred = np.asarray(
                jax.jit(lambda p, v: model.apply({"params": p}, v))(state.params, x)[0]
            )
            pred255 = np.clip(np.clip(pred, 0, 1).squeeze() * 255.0 + 0.5,
                              0, 255).astype(np.uint8)
            noise_name = os.path.splitext(os.path.basename(ds.noise_paths[0]))[0]
            clean_name = os.path.splitext(os.path.basename(ds.clean_paths[0]))[0]
            if epoch == 10:
                save_png(clean_img.squeeze(-1).astype(np.uint8),
                         os.path.join(validation_path,
                                      f"{clean_name}_000-{epoch:03d}_clean.png"))
                save_png(noisy_img.squeeze(-1).astype(np.uint8),
                         os.path.join(validation_path,
                                      f"{noise_name}_000-{epoch:03d}_noisy.png"))
            save_png(pred255,
                     os.path.join(validation_path,
                                  f"{noise_name}_000-{epoch:03d}_denoised.png"))

    return study


if __name__ == "__main__":
    main()
