"""End-to-end CLI smoke tests on a synthetic SEM-like fixture set."""
import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # multi-minute e2e tier

@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("semdata")
    (root / "clean").mkdir()
    (root / "noise").mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):
        # structured "SEM" pattern: blobs + gradient
        yy, xx = np.mgrid[0:64, 0:64]
        clean = (
            120
            + 60 * np.sin(xx / 6.0 + i)
            + 40 * ((yy // 16 + xx // 16) % 2)
        ).clip(0, 255).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, 15, clean.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(clean).save(root / "clean" / f"sem0000_{i:02d}.png")
        Image.fromarray(noisy).save(root / "noise" / f"sem0000_{i:02d}.png")
    return str(root)


def test_train_and_eval_cli(fixture_dataset, tmp_path, capsys):
    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path / "results")
    state = train_cli.main([
        "--data_dir", fixture_dataset,
        "--save_model_path", save_root,
        "--log_name", "UNetImproved_test",
        "--n_feature", "16",
        "--n_channel", "1",
        "--n_epoch", "2",
        "--batchsize", "2",
        "--n_snapshot", "2",
    ])
    # the lag-1 pipelined loop must still log EVERY iteration, in order:
    # 3 imgs / batch 2 with drop_last => 1 iter/epoch x 2 epochs
    import re

    out = capsys.readouterr().out
    iters = re.findall(
        r"^(\d{4}) (\d{5}) Loss1=([\d.]+), Loss_Full=([\d.]+)", out, re.M)
    assert [(int(e), int(i)) for e, i, _, _ in iters] == [(1, 0), (2, 0)], iters
    assert all(np.isfinite(float(l)) for _, _, l, _ in iters)
    # find checkpoint
    ckpts = []
    for dirpath, _, files in os.walk(save_root):
        ckpts += [os.path.join(dirpath, f) for f in files if f.endswith(".ckpt")]
    assert any("epoch_model_002" in c for c in ckpts)
    ckpt = [c for c in ckpts if "epoch_model_002" in c][0]

    # A_log.csv (snapshot epoch 2) records the epoch mean of the logged
    # Loss1 values — the lag-1 flush must feed the mean before it is written
    alogs = []
    for dirpath, _, files in os.walk(save_root):
        alogs += [os.path.join(dirpath, f) for f in files if f == "A_log.csv"]
    assert len(alogs) == 1, alogs
    rows = open(alogs[0]).read().strip().splitlines()
    assert len(rows) == 1 and rows[0].startswith("epoch2, loss_"), rows
    logged_mean = float(rows[0].split("loss_")[1].split(",")[0])
    ep2 = [float(l) for e, _, l, _ in iters if int(e) == 2]
    assert abs(logged_mean - np.mean(ep2)) < 1e-6, (logged_mean, ep2)

    # whole-frame eval
    from image_denoising_tpu.cli import evaluation as eval_cli

    save_dir = str(tmp_path / "eval")
    avg = eval_cli.main([
        "--data_dir", fixture_dataset,
        "--checkpoint", ckpt,
        "--save_dir", save_dir,
        "--n_feature", "16",
        "--log_name", "UNetImproved_test",
    ])
    assert os.path.exists(os.path.join(save_dir, "metrics.txt"))
    assert avg["psnr"] > 5.0

    # --device_metrics on the whole-image CLI: fused forward+quantize+score
    # program, no prediction fetch with --save_images none
    save_dir_dm = str(tmp_path / "eval_dm")
    avg_dm = eval_cli.main([
        "--data_dir", fixture_dataset,
        "--checkpoint", ckpt,
        "--save_dir", save_dir_dm,
        "--n_feature", "16",
        "--log_name", "UNetImproved_test",
        "--device_metrics",
        "--save_images", "none",
    ])
    assert abs(avg_dm["psnr"] - avg["psnr"]) < 1e-3
    assert abs(avg_dm["ssim"] - avg["ssim"]) < 1e-4
    assert abs(avg_dm["l1"] - avg["l1"]) < 1e-6
    assert not [f for f in os.listdir(save_dir_dm) if f.endswith(".png")]

    # tiled eval with IQ-IoU
    from image_denoising_tpu.cli import evaluation_704_iqsl as eval704

    save_dir2 = str(tmp_path / "eval704")
    avg2 = eval704.main([
        "--data_dir", fixture_dataset,
        "--checkpoint", ckpt,
        "--save_dir", save_dir2,
        "--n_feature", "16",
        "--log_name", "UNetImproved_test",
        "--tile", "32",
        "--overlap", "16",
        "--compute_iq_iou",
    ])
    assert "iou_dark" in avg2
    text = open(os.path.join(save_dir2, "metrics.txt")).read()
    assert "Average 3-class IoU" in text

    # --save_images denoised: identical metrics, only denoised PNGs written
    save_dir3 = str(tmp_path / "eval704_denoised_only")
    avg3 = eval704.main([
        "--data_dir", fixture_dataset,
        "--checkpoint", ckpt,
        "--save_dir", save_dir3,
        "--n_feature", "16",
        "--log_name", "UNetImproved_test",
        "--tile", "32",
        "--overlap", "16",
        "--compute_iq_iou",
        "--save_images", "denoised",
    ])
    for k in avg2:
        assert abs(avg3[k] - avg2[k]) < 1e-12, k
    pngs = [f for f in os.listdir(save_dir3) if f.endswith(".png")]
    assert pngs and all("denoised" in f for f in pngs), pngs


def test_denoise_cli_matches_eval704(fixture_dataset, tmp_path):
    """The pure-inference serving CLI (cli/denoise.py, no clean/ dir needed)
    must write byte-identical denoised PNGs to evaluation_704 at matched
    settings — both the burst path (with a padded tail: 3 frames, burst 2)
    and the single-frame fallback."""
    from image_denoising_tpu.cli import denoise as denoise_cli
    from image_denoising_tpu.cli import evaluation_704 as eval704
    from image_denoising_tpu.cli import train as train_cli
    from PIL import Image

    save_root = str(tmp_path / "results")
    train_cli.main([
        "--data_dir", fixture_dataset, "--save_model_path", save_root,
        "--log_name", "UNetImproved_dn", "--n_feature", "8",
        "--n_epoch", "1", "--batchsize", "2", "--max_steps_per_epoch", "1",
    ])
    ckpts = []
    for dirpath, _, files in os.walk(save_root):
        ckpts += [os.path.join(dirpath, f) for f in files
                  if f.endswith("epoch_model_001.ckpt")]

    eval_dir = str(tmp_path / "eval")
    eval704.main([
        "--data_dir", fixture_dataset, "--checkpoint", ckpts[0],
        "--n_feature", "8", "--log_name", "UNetImproved_dn",
        "--tile", "32", "--overlap", "16", "--save_dir", eval_dir,
        "--save_images", "denoised",
    ])
    ref = {}
    for f in sorted(os.listdir(eval_dir)):
        if f.endswith("_denoised.png"):
            # evaluation_704 names "<stem>_<idx>_denoised.png"
            stem = f.rsplit("_", 2)[0]
            ref[stem] = np.asarray(Image.open(os.path.join(eval_dir, f)))
    assert len(ref) == 3

    noise_dir = os.path.join(fixture_dataset, "noise")
    # --parallel shards the burst's tile stack over the mesh: conv batch
    # sizes differ from the -1 scan, so low-order float bits can move a
    # blended pixel across a uint8 boundary (atol 1, like the pburst test)
    for mode, extra, atol in (("burst2", ["--frame_burst", "2"], 0),
                              ("single", ["--frame_burst", "0"], 0),
                              ("pburst", ["--frame_burst", "2", "--parallel"], 1)):
        out_dir = str(tmp_path / f"dn_{mode}")
        n = denoise_cli.main([
            "--input_dir", noise_dir, "--save_dir", out_dir,
            "--checkpoint", ckpts[0], "--n_feature", "8",
            "--log_name", "UNetImproved_dn", "--tile", "32",
            "--overlap", "16", "--dtype", "float32",
            "--tile_batch", "-1",
        ] + extra)
        assert n == 3
        for stem, want in ref.items():
            got = np.asarray(Image.open(
                os.path.join(out_dir, f"{stem}_denoised.png")))
            if atol == 0:
                assert np.array_equal(got, want), (mode, stem)
            else:
                diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
                assert diff.max() <= atol, (mode, stem, diff.max())

    # same stem, different extensions, must not overwrite each other
    coll_in = tmp_path / "coll_in"
    coll_in.mkdir()
    src = sorted(os.listdir(noise_dir))[0]
    img = Image.open(os.path.join(noise_dir, src))
    img.save(coll_in / "frame01.png")
    img.save(coll_in / "frame01.tif")
    coll_out = str(tmp_path / "coll_out")
    n = denoise_cli.main([
        "--input_dir", str(coll_in), "--save_dir", coll_out,
        "--checkpoint", ckpts[0], "--n_feature", "8",
        "--log_name", "UNetImproved_dn", "--tile", "32",
        "--overlap", "16", "--dtype", "float32",
        "--tile_batch", "-1", "--frame_burst", "2",
    ])
    assert n == 2
    outs = sorted(os.listdir(coll_out))
    assert len(outs) == 2, outs
    a, b = (np.asarray(Image.open(os.path.join(coll_out, f))) for f in outs)
    assert np.array_equal(a, b)  # identical content, two distinct files


def test_eval_frame_burst_matches_sequential(fixture_dataset, tmp_path):
    """--frame_burst (burst-pipelined frames, the bench pipeline shape) must
    be byte-identical to the reference frame-by-frame path, including the
    padded tail burst (3 frames, burst 2)."""
    from image_denoising_tpu.cli import evaluation_704 as eval704
    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path / "results")
    train_cli.main([
        "--data_dir", fixture_dataset, "--save_model_path", save_root,
        "--log_name", "UNetImproved_fb", "--n_feature", "8",
        "--n_epoch", "1", "--batchsize", "2", "--max_steps_per_epoch", "1",
    ])
    ckpts = []
    for dirpath, _, files in os.walk(save_root):
        ckpts += [os.path.join(dirpath, f) for f in files
                  if f.endswith("epoch_model_001.ckpt")]
    args = [
        "--data_dir", fixture_dataset, "--checkpoint", ckpts[0],
        "--n_feature", "8", "--log_name", "UNetImproved_fb",
        "--tile", "32", "--overlap", "16",
    ]
    seq_dir = str(tmp_path / "seq")
    avg_seq = eval704.main(args + ["--save_dir", seq_dir])
    from PIL import Image

    # plain burst (same -1 scan chunking as sequential → byte-identical) AND
    # mesh-sharded burst (--parallel forces tile_batch 0, so conv batch sizes
    # differ from the sequential scan → low-order float bits can move a
    # blended pixel across a uint8 quantization boundary: atol 1, not bytes)
    for mode, extra, atol in (("burst", [], 0), ("pburst", ["--parallel"], 1)):
        out_dir = str(tmp_path / mode)
        avg = eval704.main(
            args + ["--save_dir", out_dir, "--frame_burst", "2"] + extra
        )
        # the float metrics may differ in the last ulps under --parallel
        # (sharded-reduction summation order)
        for k in avg_seq:
            np.testing.assert_allclose(avg[k], avg_seq[k], rtol=1e-6,
                                       err_msg=f"{mode}:{k}")
        for f in sorted(os.listdir(seq_dir)):
            if f.endswith(".png"):
                a = np.asarray(Image.open(os.path.join(seq_dir, f)))
                b = np.asarray(Image.open(os.path.join(out_dir, f)))
                if atol == 0:
                    assert np.array_equal(a, b), (mode, f)
                else:
                    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
                    assert diff.max() <= atol, (mode, f, diff.max())


def test_eval_frame_burst_mixed_shapes(fixture_dataset, tmp_path):
    """Directories with MIXED frame sizes exercise the burst stream's
    per-shape buckets and the non-monotonic drain order (the metrics loop
    walks frames in directory order while bursts stream shape-by-shape).
    Must match the sequential path byte-for-byte; --device_metrics must
    score each bucket with its own program."""
    from PIL import Image

    from image_denoising_tpu.cli import evaluation_704 as eval704
    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path / "results")
    train_cli.main([
        "--data_dir", fixture_dataset, "--save_model_path", save_root,
        "--log_name", "UNetImproved_mix", "--n_feature", "8",
        "--n_epoch", "1", "--batchsize", "2", "--max_steps_per_epoch", "1",
    ])
    ckpts = []
    for dirpath, _, files in os.walk(save_root):
        ckpts += [os.path.join(dirpath, f) for f in files
                  if f.endswith("epoch_model_001.ckpt")]

    # interleaved shapes in directory order: 64x64, 64x96, 64x64, 64x96
    mix = tmp_path / "mixdata"
    (mix / "clean").mkdir(parents=True)
    (mix / "noise").mkdir()
    rng = np.random.default_rng(3)
    for i, w in enumerate((64, 96, 64, 96)):
        yy, xx = np.mgrid[0:64, 0:w]
        clean = (100 + 50 * np.sin(xx / 7.0 + i) + 30 * (yy // 16 % 2)
                 ).clip(0, 255).astype(np.uint8)
        noisy = np.clip(clean + rng.normal(0, 15, clean.shape), 0, 255
                        ).astype(np.uint8)
        Image.fromarray(clean).save(mix / "clean" / f"m_{i:02d}.png")
        Image.fromarray(noisy).save(mix / "noise" / f"m_{i:02d}.png")

    args = [
        "--data_dir", str(mix), "--checkpoint", ckpts[0],
        "--n_feature", "8", "--log_name", "UNetImproved_mix",
        "--tile", "32", "--overlap", "16",
    ]
    seq_dir = str(tmp_path / "mix_seq")
    avg_seq = eval704.main(args + ["--save_dir", seq_dir])

    fb_dir = str(tmp_path / "mix_fb")
    avg_fb = eval704.main(
        args + ["--save_dir", fb_dir, "--frame_burst", "2", "--device_metrics"]
    )
    assert abs(avg_fb["psnr"] - avg_seq["psnr"]) < 1e-3
    assert abs(avg_fb["ssim"] - avg_seq["ssim"]) < 1e-5
    np.testing.assert_allclose(avg_fb["l1"], avg_seq["l1"], rtol=1e-6)
    for f in sorted(os.listdir(seq_dir)):
        if f.endswith(".png"):
            a = np.asarray(Image.open(os.path.join(seq_dir, f)))
            b = np.asarray(Image.open(os.path.join(fb_dir, f)))
            assert np.array_equal(a, b), f


def test_eval_device_metrics_matches_host(fixture_dataset, tmp_path):
    """--device_metrics scores PSNR/SSIM on device (f32 ssim_jax) and must
    match the host float64 MATLAB-SSIM pass to ~1e-5 and host-f32 PSNR to
    ~1e-3 (summation order); with --save_images none predictions are never
    fetched and no PNGs are written."""
    from image_denoising_tpu.cli import evaluation_704 as eval704
    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path / "results")
    train_cli.main([
        "--data_dir", fixture_dataset, "--save_model_path", save_root,
        "--log_name", "UNetImproved_dm", "--n_feature", "8",
        "--n_epoch", "1", "--batchsize", "2", "--max_steps_per_epoch", "1",
    ])
    ckpts = []
    for dirpath, _, files in os.walk(save_root):
        ckpts += [os.path.join(dirpath, f) for f in files
                  if f.endswith("epoch_model_001.ckpt")]
    args = [
        "--data_dir", fixture_dataset, "--checkpoint", ckpts[0],
        "--n_feature", "8", "--log_name", "UNetImproved_dm",
        "--tile", "32", "--overlap", "16", "--compute_iq_iou",
    ]
    host_dir = str(tmp_path / "host")
    avg_host = eval704.main(args + ["--save_dir", host_dir])

    # burst-2 device metrics, PNGs still written (byte-identical preds)
    dm_dir = str(tmp_path / "dm")
    avg_dm = eval704.main(
        args + ["--save_dir", dm_dir, "--frame_burst", "2", "--device_metrics"]
    )
    assert abs(avg_dm["psnr"] - avg_host["psnr"]) < 1e-3
    assert abs(avg_dm["ssim"] - avg_host["ssim"]) < 1e-5
    np.testing.assert_allclose(avg_dm["l1"], avg_host["l1"], rtol=1e-6)
    # IQ-IoU scored on device (f32 GT-quantile thresholds) vs host f64
    for key in ("iou_dark", "iou_mid", "iou_bright"):
        np.testing.assert_allclose(avg_dm[key], avg_host[key], atol=1e-6)
    from PIL import Image

    for f in sorted(os.listdir(host_dir)):
        if f.endswith(".png"):
            a = np.asarray(Image.open(os.path.join(host_dir, f)))
            b = np.asarray(Image.open(os.path.join(dm_dir, f)))
            assert np.array_equal(a, b), f

    # metric-only mode: no frame_burst given (forced to 1-frame bursts),
    # predictions never fetched, zero PNGs
    none_dir = str(tmp_path / "dm_none")
    avg_none = eval704.main(
        args + ["--save_dir", none_dir, "--device_metrics",
                "--save_images", "none"]
    )
    assert abs(avg_none["psnr"] - avg_dm["psnr"]) < 1e-5
    assert abs(avg_none["ssim"] - avg_dm["ssim"]) < 1e-6
    for key in ("iou_dark", "iou_mid", "iou_bright"):
        np.testing.assert_allclose(avg_none[key], avg_host[key], atol=1e-6)
    assert not [f for f in os.listdir(none_dir) if f.endswith(".png")]


def test_train_n2n_mode(fixture_dataset, tmp_path):
    from image_denoising_tpu.cli import train as train_cli

    train_cli.main([
        "--data_dir", fixture_dataset,
        "--save_model_path", str(tmp_path / "results_n2n"),
        "--log_name", "UNET_n2n_test",
        "--loss", "n2n",
        "--noisetype", "gauss25",
        "--n_feature", "8",
        "--n_epoch", "1",
        "--batchsize", "2",
    ])


def test_train_blindspot_e2e(fixture_dataset, tmp_path):
    """Blindspot-UNet TRAINING end-to-end (VERDICT r3 missing #3): the
    reference trains the 4-rotation shifted-conv UNet via its 'blindspot'
    log_name substring (train.py:298-302). Train 2 epochs through the fused
    step, assert the checkpoint really is the blindspot topology (nin_a
    consumes the 4-rotation concat: 96*4 input channels), then eval it
    through the same dispatch. The explicit `--arch UNet --blindspot` path
    must produce the identical parameter tree."""
    import glob

    import jax

    from image_denoising_tpu.ckpt import load_checkpoint
    from image_denoising_tpu.cli import evaluation as eval_cli
    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path / "results_bs")
    train_cli.main([
        "--data_dir", fixture_dataset,
        "--save_model_path", save_root,
        "--log_name", "UNET_blindspot_test",
        "--n_feature", "8",
        "--n_epoch", "2",
        "--batchsize", "2",
        "--n_snapshot", "2",
    ])
    ckpt = glob.glob(os.path.join(save_root, "**", "epoch_model_002.ckpt"),
                     recursive=True)[0]
    params = load_checkpoint(ckpt, arch="UNet")
    shapes = {
        "/".join(map(str, path)): v.shape
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    nin_a = [s for k, s in shapes.items() if "nin_a" in k and len(s) == 4]
    assert nin_a == [(1, 1, 4 * 96, 4 * 96)], (
        f"checkpoint is not the blindspot topology: nin_a kernels {nin_a}"
    )

    avg = eval_cli.main([
        "--data_dir", fixture_dataset,
        "--checkpoint", ckpt,
        "--save_dir", str(tmp_path / "eval_bs"),
        "--n_feature", "8",
        "--log_name", "UNET_blindspot_test",
    ])
    # smoke bar: blindspot predicts from context only, so 2 epochs of an
    # 8-feature net stays low-PSNR — finite and not degenerate is the check
    assert np.isfinite(avg["psnr"]) and avg["psnr"] > 3.0

    # explicit-arch path: --arch UNet --blindspot == log_name dispatch
    save_root2 = str(tmp_path / "results_bs_arch")
    train_cli.main([
        "--data_dir", fixture_dataset,
        "--save_model_path", save_root2,
        "--log_name", "explicit_arch_test",
        "--arch", "UNet",
        "--blindspot",
        "--n_feature", "8",
        "--n_epoch", "1",
        "--batchsize", "2",
    ])
    ckpt2 = glob.glob(os.path.join(save_root2, "**", "epoch_model_001.ckpt"),
                      recursive=True)[0]
    params2 = load_checkpoint(ckpt2, arch="UNet")
    shapes2 = {
        "/".join(map(str, path)): v.shape
        for path, v in jax.tree_util.tree_flatten_with_path(params2)[0]
    }
    assert shapes2 == shapes, "explicit --blindspot tree differs from dispatch"


def test_train_resume_and_profile(fixture_dataset, tmp_path):
    """--resume continues params; --profile_dir writes a trace."""
    import glob

    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path / "resume_results")
    train_cli.main([
        "--data_dir", fixture_dataset,
        "--save_model_path", save_root,
        "--log_name", "UNetImproved_resume",
        "--n_feature", "8",
        "--n_epoch", "1",
        "--batchsize", "2",
    ])
    ckpt = glob.glob(os.path.join(save_root, "**", "epoch_model_001.ckpt"),
                     recursive=True)[0]

    prof_dir = str(tmp_path / "trace")
    train_cli.main([
        "--data_dir", fixture_dataset,
        "--save_model_path", str(tmp_path / "resume2"),
        "--log_name", "UNetImproved_resume",
        "--n_feature", "8",
        "--n_epoch", "2",
        "--start_epoch", "2",
        "--batchsize", "2",
        "--resume", ckpt,
        "--profile_dir", prof_dir,
        "--profile_steps", "1",
    ])
    # a trace directory with content was produced
    assert os.path.isdir(prof_dir) and len(os.listdir(prof_dir)) > 0


def test_eval_host_workers_identical(fixture_dataset, tmp_path, capsys):
    """--host_workers N runs the per-frame host pass (PSNR/SSIM/PNG) in a
    thread pool but finalizes in frame order: stdout lines, metrics.txt and
    every PNG must be byte-identical to the inline default."""
    from image_denoising_tpu.cli import evaluation_704 as eval704
    from image_denoising_tpu.cli import train as train_cli

    save_root = str(tmp_path / "results")
    train_cli.main([
        "--data_dir", fixture_dataset, "--save_model_path", save_root,
        "--log_name", "UNetImproved_hw", "--n_feature", "8",
        "--n_epoch", "1", "--batchsize", "2", "--max_steps_per_epoch", "1",
    ])
    ckpts = []
    for dirpath, _, files in os.walk(save_root):
        ckpts += [os.path.join(dirpath, f) for f in files
                  if f.endswith("epoch_model_001.ckpt")]
    args = [
        "--data_dir", fixture_dataset, "--checkpoint", ckpts[0],
        "--n_feature", "8", "--log_name", "UNetImproved_hw",
        "--tile", "32", "--overlap", "16", "--compute_iq_iou",
    ]

    def frame_lines(text):
        return [ln for ln in text.splitlines() if ln.startswith("[")]

    inline_dir = str(tmp_path / "inline")
    avg_inline = eval704.main(args + ["--save_dir", inline_dir])
    lines_inline = frame_lines(capsys.readouterr().out)

    pooled_dir = str(tmp_path / "pooled")
    avg_pooled = eval704.main(
        args + ["--save_dir", pooled_dir, "--host_workers", "2"])
    lines_pooled = frame_lines(capsys.readouterr().out)

    assert lines_pooled == lines_inline
    assert avg_pooled == avg_inline
    inline_files = sorted(os.listdir(inline_dir))
    assert inline_files == sorted(os.listdir(pooled_dir))
    for f in inline_files:
        a = open(os.path.join(inline_dir, f), "rb").read()
        b = open(os.path.join(pooled_dir, f), "rb").read()
        assert a == b, f

    # serving CLI: pooled PNG encode writes the same frames
    from image_denoising_tpu.cli import denoise as denoise_cli

    serve_args = [
        "--input_dir", os.path.join(fixture_dataset, "noise"),
        "--checkpoint", ckpts[0], "--n_feature", "8",
        "--log_name", "UNetImproved_hw", "--tile", "32", "--overlap", "16",
        "--frame_burst", "2", "--dtype", "float32",
    ]
    serve_inline = str(tmp_path / "serve_inline")
    denoise_cli.main(serve_args + ["--save_dir", serve_inline])
    serve_pooled = str(tmp_path / "serve_pooled")
    denoise_cli.main(
        serve_args + ["--save_dir", serve_pooled, "--host_workers", "2"])
    files = sorted(os.listdir(serve_inline))
    assert files and files == sorted(os.listdir(serve_pooled))
    for f in files:
        a = open(os.path.join(serve_inline, f), "rb").read()
        b = open(os.path.join(serve_pooled, f), "rb").read()
        assert a == b, f
