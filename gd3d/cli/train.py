"""Training CLI — the analogue of `python3 src/main.py --config-name ...`.

Usage:
  python -m gd3d.cli.train --config finetune_timm_mast3r_scannetpp \
      [--data-root data/] [--epochs 500] [--steps-per-epoch 100] \
      [--batch-per-device 1] [--dev] [--output outputs/run1] \
      [--student-ckpt timm.pth] [--teacher-ckpt mast3r.pth]

Behavioral parity with src/main.py:94-162: seed 42, 500 epochs, grad clip
1.0, checkpoint every epoch, eval every 10 epochs (when eval data exists),
dev mode limits to 2 batches (main.py:100-102). Differences by design:
typed configs instead of Hydra, orbax adapter-only checkpoints, JSONL +
TensorBoard metrics, one jitted step over a data-parallel mesh.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="finetune_timm_me_objaverse",
                   help="named config (gd3d/core/config.py NAMED_CONFIGS / "
                        "gd3d/configs/<name>.yaml) or a path to a .yaml")
    p.add_argument("--data-root", default="data")
    p.add_argument("--output", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=100)
    p.add_argument("--batch-per-device", type=int, default=1)
    p.add_argument("--dev", action="store_true",
                   help="2-batch smoke run on synthetic data (main.py:100-102)")
    p.add_argument("--student-ckpt", default=None,
                   help="torch state_dict (.pth) of the pretrained timm student")
    p.add_argument("--teacher-ckpt", default=None,
                   help="torch state_dict (.pth) of MASt3R / VGGT")
    p.add_argument("--synthetic", action="store_true",
                   help="force the synthetic data pipeline")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + tiny shapes (CI smoke testing)")
    p.add_argument("--debug-nans", action="store_true",
                   help="jax_debug_nans: fail fast on NaN/Inf in any op")
    p.add_argument("--multistep", type=int, default=1, metavar="K",
                   help="MASt3R/VGGT: run K optimizer steps per XLA dispatch "
                        "(lax.scan trainer; amortizes host dispatch, +9%% on "
                        "the v5e bench at K=8)")
    p.add_argument("--tensorboard", action="store_true",
                   help="also mirror step metrics to TensorBoard (tf.summary)")
    p.add_argument("--eval-every", type=int, default=None,
                   help="override cfg.train.eval_every_epochs (default 10)")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume from a save_train_state checkpoint dir (e.g. "
                        "<run>/last); restores adapters + optimizer + epoch")
    p.add_argument("--workers", type=int, default=0,
                   help="grain worker processes for the host pipeline "
                        "(0 = threaded prefetch only; the reference uses 10 "
                        "DataLoader workers, finetune_timm_mast3r.py:232-240)")
    p.add_argument("--fsdp-teacher", action="store_true",
                   help="shard the FROZEN teacher params over the data "
                        "mesh axis (ZeRO-3-style per-layer all-gathers; "
                        "gd3d/parallel/fsdp.py) instead of replicating "
                        "them on every chip")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before backend "
                        "init: one process per TPU host of a pod slice, "
                        "coordinator/process env via the standard JAX "
                        "cluster autodetection. The mesh then spans every "
                        "chip of the slice, batches shard per-process "
                        "(grain ShardOptions / PrefetchLoader seed offset), "
                        "and gradient all-reduce rides ICI - the reference's "
                        "DDP multi-node story (src/main.py:147-161) without "
                        "NCCL/torchrun")
    return p.parse_args(argv)


def load_torch_state(path: str) -> dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    if args.multihost:
        # must run before first backend use; no-op coordination in a
        # single-process launch is an error, so only behind the flag
        jax.distributed.initialize()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    tb_writer = None
    if args.tensorboard:
        import tensorflow as tf  # baked in; used only for summaries

    from gd3d.core import config as cfglib
    from gd3d.core.checkpoint import (
        restore_train_state,
        save_checkpoint,
        save_train_state,
    )
    from gd3d.core.mesh import make_mesh, shard_batch
    from gd3d.data.loader import PrefetchIterator
    from gd3d.data.synthetic import synthetic_me_batch
    from gd3d.distill import build_me_train_step, make_optimizer
    from gd3d.distill.train_state import init_state
    from gd3d.models.student import Student, split_params
    from gd3d.teachers.convert import convert_timm_vit, graft_pretrained_vit

    cfg = cfglib.resolve_config(args.config)
    if args.tiny:
        cfg = cfg.replace(
            student=cfglib.StudentConfig(
                embed_dim=32, depth=4, num_heads=2, patch_size=16,
                pretrain_img_size=32, lora_start_block=2, use_adapters=False,
                target_res=64, depth_head_hidden=16,
            ),
            keypoints=cfglib.KeypointConfig(nn_subsample=16),
        )
    if args.epochs:
        cfg = cfg.replace(train=cfg.train.__class__(
            **{**cfg.train.__dict__, "max_epochs": args.epochs}))
    if args.eval_every:
        cfg = cfg.replace(train=cfg.train.__class__(
            **{**cfg.train.__dict__, "eval_every_epochs": args.eval_every}))
    if args.fsdp_teacher:
        cfg = cfg.replace(mesh=cfg.mesh.__class__(
            **{**cfg.mesh.__dict__, "fsdp_teacher": True}))
    epochs = 1 if args.dev else cfg.train.max_epochs
    steps = 2 if args.dev else args.steps_per_epoch

    is_main = jax.process_index() == 0
    out_dir = Path(args.output or f"outputs/{args.config}/{time.strftime('%Y%m%d_%H%M%S')}")
    if not is_main:
        # per-process metric streams; checkpoints are main-process-only
        out_dir = out_dir / f"proc{jax.process_index()}"
    out_dir.mkdir(parents=True, exist_ok=True)
    metrics_path = out_dir / "metrics.jsonl"
    if args.tensorboard:
        import tensorflow as tf

        tb_writer = tf.summary.create_file_writer(str(out_dir / "tb"))

    np.random.seed(cfg.train.seed)
    mesh = make_mesh(n_model=cfg.mesh.model)
    n_data = mesh.shape["data"]

    student = Student(cfg.student, me_interp_quirk=(cfg.teacher == "me"))
    params = student.init(jax.random.key(cfg.train.seed), img_size=64)
    if args.student_ckpt:
        state_np = load_torch_state(args.student_ckpt)
        params["vit"] = graft_pretrained_vit(
            params["vit"], convert_timm_vit(state_np, cfg.student)
        )
        print(f"loaded pretrained student from {args.student_ckpt}")
    trainable, frozen = split_params(params)
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)

    start_epoch = 0
    if args.resume:
        state, start_epoch = restore_train_state(args.resume, state)
        print(f"resumed from {args.resume}; continuing at epoch {start_epoch}")

    # ----- teacher + step builder ---------------------------------------
    teacher_params = None
    if cfg.teacher == "me":
        step_fn = build_me_train_step(student, cfg, tx)

        def run_step(state, batch, temperature):
            return step_jit(state, frozen, batch)

    elif cfg.teacher == "mast3r":
        from gd3d.distill.mast3r_step import build_mast3r_train_step
        from gd3d.models.croco import CrocoConfig
        from gd3d.models.mast3r import Mast3rConfig
        from gd3d.teachers.mast3r import Mast3rTeacher, convert_mast3r

        tcfg = Mast3rConfig()
        if args.tiny:
            tcfg = Mast3rConfig(
                croco=CrocoConfig(
                    patch_size=16, enc_embed_dim=32, enc_depth=2,
                    enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                    dec_num_heads=2),
                local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16)
        teacher = Mast3rTeacher(tcfg)
        if args.teacher_ckpt:
            teacher_params = convert_mast3r(load_torch_state(args.teacher_ckpt))
        else:
            print("WARNING: no --teacher-ckpt; random MASt3R weights")
            teacher_params = teacher.init_params(
                jax.random.key(1), hw=(64, 96) if args.tiny else (64, 64))
        if cfg.mesh.fsdp_teacher:
            from gd3d.parallel.fsdp import apply_fsdp_sharding

            teacher_params = apply_fsdp_sharding(
                teacher_params, mesh, with_tp=cfg.mesh.model > 1)
        has_depth = cfg.dataset == "objaverse"
        if args.multistep > 1:
            from gd3d.distill.mast3r_step import build_mast3r_train_multistep

            step_fn = build_mast3r_train_multistep(
                student, teacher, cfg, tx, has_depth)
        else:
            step_fn = build_mast3r_train_step(
                student, teacher, cfg, tx, has_depth)

        def run_step(state, batch, temperature):
            return step_jit(state, frozen, teacher_params, batch, temperature)

    elif cfg.teacher == "vggt":
        from gd3d.distill.vggt_step import build_vggt_train_step
        from gd3d.models.vggt.config import VggtConfig
        from gd3d.teachers.vggt import VggtTeacher, convert_vggt

        tcfg = VggtConfig()
        if args.tiny:
            tcfg = VggtConfig(
                img_size=28, patch_size=14, embed_dim=32, depth=2,
                num_heads=2, num_register_tokens=4, dino_depth=2,
                dino_num_heads=2, camera_trunk_depth=1, camera_iterations=2,
                dpt_features=8, dpt_out_channels=(8, 8, 8, 8),
                dpt_hooks=(0, 0, 1, 1), track_features=8, track_iters=2,
                track_stride=2, corr_levels=2, corr_radius=1,
                track_hidden_size=16)
        # DP x SP regime: batches stay sharded over `data`, the ring rides
        # the orthogonal `model` axis (same-axis SP+DP would force the
        # partitioner into replicate-and-repartition at the frame<->global
        # reshapes)
        from gd3d.core.mesh import DATA_AXIS, MODEL_AXIS

        teacher = VggtTeacher(
            tcfg, sp_mesh=mesh if cfg.mesh.sequence_parallel else None,
            sp_axis=MODEL_AXIS, sp_batch_axis=DATA_AXIS)
        if args.teacher_ckpt:
            teacher_params = convert_vggt(load_torch_state(args.teacher_ckpt))
        else:
            print("WARNING: no --teacher-ckpt; random VGGT weights")
            teacher_params = teacher.init_params(jax.random.key(1), hw=(28, 28))
        if cfg.mesh.fsdp_teacher:
            from gd3d.parallel.fsdp import apply_fsdp_sharding, sharded_fraction

            teacher_params = apply_fsdp_sharding(
                teacher_params, mesh, with_tp=cfg.mesh.model > 1)
            sh, tot = sharded_fraction(teacher_params, mesh)
            print(f"fsdp teacher: {sh / 2**20:.0f} / {tot / 2**20:.0f} MiB "
                  f"sharded over data axis")
        if args.multistep > 1:
            from gd3d.distill.vggt_step import build_vggt_train_multistep

            step_fn = build_vggt_train_multistep(student, teacher, cfg, tx)
        else:
            step_fn = build_vggt_train_step(student, teacher, cfg, tx)
        rng = jax.random.key(cfg.train.seed)

        def run_step(state, batch, temperature):
            nonlocal rng
            rng, sub = jax.random.split(rng)
            return step_jit(state, frozen, teacher_params, batch, temperature, sub)

    step_jit = jax.jit(step_fn)

    from gd3d.distill.mast3r_step import temperature_schedule

    # K optimizer steps per XLA dispatch (scan trainers); K=1 is the plain
    # one-step-per-dispatch path for every teacher.
    K = args.multistep if cfg.teacher in ("mast3r", "vggt") else 1
    batch_size = n_data * args.batch_per_device

    def host_batches(epoch):
        """Yield (live_steps, stacked numpy group batch) for one epoch.

        Runs inside the prefetch thread — decode/augment/collate overlap the
        device step, the analogue of the reference's 10 DataLoader workers
        (src/finetune_timm_mast3r.py:232-240)."""
        ds = _make_epoch_dataset(args, cfg, epoch)
        if ds is None:
            if cfg.teacher == "me":
                img, kps = (64, 64) if args.tiny else (512, 3000)

                def fetch(step):
                    return synthetic_me_batch(
                        seed=cfg.train.seed + epoch * 10000 + step,
                        batch=batch_size, img=img, n_kps=kps,
                    )
            else:
                def fetch(step):
                    return _synthetic_teacher_batch(
                        cfg, batch_size, epoch * 10000 + step, tiny=args.tiny)
        elif args.workers > 0:
            from gd3d.data.grain_pipeline import make_grain_loader

            it = make_grain_loader(
                ds, batch_size, seed=cfg.train.seed + epoch,
                transform=_sample_transform(cfg),
                worker_count=args.workers, epochs=None,
            )

            def fetch(step):
                return dict(next(it))
        else:
            from gd3d.data.loader import collate

            tr = _sample_transform(cfg)

            def fetch(step):
                samples = [tr(ds[(step * batch_size + i) % len(ds)])
                           for i in range(batch_size)]
                return collate(samples)

        # the scan trainer applies the optimizer on every one of its K
        # slices, so a short final group must NOT be padded with a
        # repeated batch (that would run real, biased updates) — round
        # the epoch UP to a multiple of K with fresh wrapped batches
        steps_run = -(-steps // K) * K
        if steps_run != steps and epoch == 0:
            print(f"steps_per_epoch {steps} rounded up to {steps_run} "
                  f"(multiple of --multistep {K})")
        for step0 in range(0, steps_run, K):
            live = list(range(step0, step0 + K))
            raw = [fetch(s) for s in live]
            if K > 1:
                batch = {k: np.stack([b[k] for b in raw]) for k in raw[0]}
            else:
                batch = raw[0]
            yield live, batch

    # Image batches cross host->device as uint8 (4x less transfer) and
    # convert back to float ON-device. All pipeline images are u8-derived
    # (PNG/JPEG decode; the color augs are u8 -> u8 like the reference's
    # albumentations), so round-tripping through u8 is LOSSLESS — measured
    # host_wait on the 1-core host was 75% of epoch wall at K=32 with f32
    # transfers (~13 MB/pair). Synthetic/dev batches (random floats, not
    # u8-derived) skip packing to keep their numerics exact.
    # same conditions _make_epoch_dataset checks before any I/O — don't
    # construct (and discard) a whole dataset just to learn the boolean
    real_data = (not args.synthetic and not args.dev
                 and Path(args.data_root).exists()
                 and os.environ.get("GD3D_U8_TRANSFER", "1") != "0")

    def _pack_u8(batch):
        out = {}
        for k, v in batch.items():
            if k.startswith("rgb_mast3r"):  # [-1, 1] = u8 / 127.5 - 1
                out[k] = np.round((v + 1.0) * 127.5).astype(np.uint8)
            elif k.startswith("rgb"):       # [0, 1] = u8 / 255
                out[k] = np.round(np.asarray(v) * 255.0).astype(np.uint8)
            else:
                out[k] = v
        return out

    @jax.jit
    def _unpack_u8(batch):
        out = {}
        for k, v in batch.items():
            if v.dtype == jnp.uint8:
                if k.startswith("rgb_mast3r"):
                    out[k] = v.astype(jnp.float32) / 127.5 - 1.0
                else:
                    out[k] = v.astype(jnp.float32) / 255.0
            else:
                out[k] = v
        return out

    def device_batches(epoch):
        """host_batches + device_put with the DP sharding — also inside the
        prefetch thread, so H2D transfer overlaps the previous step too."""
        for live, batch in host_batches(epoch):
            if real_data:
                batch = _pack_u8(batch)
            dev = shard_batch(
                mesh, {k: jnp.asarray(v) for k, v in batch.items()},
                axis=1 if K > 1 else 0,
            )
            yield live, (_unpack_u8(dev) if real_data else dev)

    print(f"mesh: {dict(mesh.shape)}; output: {out_dir}")
    with mesh, open(metrics_path, "a") as mf:
        for epoch in range(start_epoch, epochs):
            temp = temperature_schedule(cfg, epoch)
            epoch_metrics = {}
            source = PrefetchIterator(device_batches(epoch), depth=2)
            epoch_t0 = time.perf_counter()
            for live, batch in source:
                t0 = time.perf_counter()
                state, metrics = run_step(state, batch, temp)
                loss = float(np.asarray(metrics["loss"]).reshape(-1)[-1])
                dt = time.perf_counter() - t0
                stacked = {k: np.asarray(v).reshape(-1)
                           for k, v in metrics.items()}
                for i, step in enumerate(live):
                    rec = {k: float(v[i if v.size > 1 else 0])
                           for k, v in stacked.items()}
                    for k, v in rec.items():
                        epoch_metrics.setdefault(k, []).append(v)
                    rec.update(epoch=epoch, step=step, time_s=dt / len(live),
                               temperature=temp)
                    mf.write(json.dumps(rec) + "\n")
                    if tb_writer is not None:
                        with tb_writer.as_default(step=epoch * steps + step):
                            import tensorflow as tf

                            for k, v in rec.items():
                                tf.summary.scalar(k, v)
                mf.flush()
                print(f"epoch {epoch} step {live[-1]}: loss={loss:.4f} "
                      f"({dt:.2f}s / {len(live)} steps)")
            epoch_wall = time.perf_counter() - epoch_t0
            # epoch-mean logging (EvaluationCallback, evaluate_timm.py:612-639)
            means = {f"epoch/{k}": float(np.mean(v))
                     for k, v in epoch_metrics.items()}
            means["epoch"] = epoch
            # host-bound fraction: seconds the step thread blocked on data
            means["epoch/host_wait_s"] = round(source.wait_time, 4)
            means["epoch/wall_s"] = round(epoch_wall, 4)
            mf.write(json.dumps(means) + "\n")
            mf.flush()
            if is_main and (epoch + 1) % cfg.train.ckpt_every_epochs == 0:
                # adapter-only checkpoint (reference layout parity artifact)
                save_checkpoint(str(out_dir / f"ckpt_epoch_{epoch + 1:04d}"),
                                jax.device_get(state.trainable))
                # full restart state (Lightning save_last, main.py:138-145)
                save_train_state(str(out_dir / "last"), state, epoch)
            # periodic eval over the configured method list every 10 epochs
            # (EvaluationCallback, evaluate_timm.py:591-730)
            if (epoch + 1) % cfg.train.eval_every_epochs == 0:
                from gd3d.eval.callback import run_eval_callback
                from gd3d.models.student import merge_params

                full = merge_params(jax.device_get(state.trainable), frozen)
                summary = run_eval_callback(
                    student, full, cfg.evaluation_methods, args.data_root,
                    str(out_dir), epoch + 1,
                )
                if summary:
                    summary["epoch"] = epoch
                    mf.write(json.dumps(summary) + "\n")
                    mf.flush()
    print("training finished")


def _make_epoch_dataset(args, cfg, epoch):
    """Per-epoch-seeded map-style dataset, or None for synthetic data."""
    if args.synthetic or args.dev:
        return None
    if not Path(args.data_root).exists():
        print(f"WARNING: data root {args.data_root} missing; synthetic data")
        return None
    if cfg.teacher == "me":
        from gd3d.data.objaverse import (
            AugmentedCorrDataset,
            ObjaverseCorrDataset,
        )

        root = Path(args.data_root) / "objaverse_renderings"
        names = (Path(args.data_root) / "10k.txt").read_text().splitlines()
        poses = np.load(Path(args.data_root) / "obj_poses.npy")
        return AugmentedCorrDataset(
            ObjaverseCorrDataset(str(root), names[:10_000], poses,
                                 seed=cfg.train.seed + epoch),
            seed=cfg.train.seed + epoch,
        )
    if cfg.dataset == "scannetpp":
        from gd3d.data.scannetpp import AugmentedScanNetPPDataset, ScanNetPPDataset

        return AugmentedScanNetPPDataset(
            ScanNetPPDataset(str(Path(args.data_root) / "scannetpp"),
                             vggt=(cfg.teacher == "vggt"),
                             seed=cfg.train.seed + epoch),
            seed=cfg.train.seed + epoch,
        )
    from gd3d.data.objaverse import (
        AugmentedObjaverseDataset,
        ObjaverseMASt3RDataset,
    )

    names = (Path(args.data_root) / "10k.txt").read_text().splitlines()
    return AugmentedObjaverseDataset(
        ObjaverseMASt3RDataset(
            str(Path(args.data_root) / "objaverse_renderings"),
            names[:10_000], seed=cfg.train.seed + epoch,
            vggt=(cfg.teacher == "vggt"),
        ),
        seed=cfg.train.seed + epoch,
    )


def _sample_transform(cfg):
    """Per-sample host transform: fixed-capacity keypoint padding for the ME
    pipeline (native pad when libgd3d_native.so is built), string/None drop
    for the teacher pipelines."""
    if cfg.teacher == "me":
        from gd3d.native_runtime import pad_keypoints

        def tr(s):
            s = dict(s)
            for v in ("1", "2"):
                kp, p3, val = pad_keypoints(
                    s[f"pts2d_{v}"], s[f"pts3d_{v}"], 3000,
                    s.get(f"valid_{v}"),
                )
                s[f"pts2d_{v}"], s[f"pts3d_{v}"], s[f"valid_{v}"] = kp, p3, val
                s.pop(f"mask_{v}", None)
                s.pop(f"rot_{v}", None)
            return s

        return tr

    def tr(s):
        return {k: v for k, v in s.items()
                if v is not None and not isinstance(v, str)}

    return tr


def _synthetic_teacher_batch(cfg, batch, seed, tiny=False):
    rng = np.random.RandomState(seed)
    R = 128 if tiny else 512  # student-view resolution
    if cfg.teacher == "vggt":
        V = 28 if tiny else 518
        return {
            "rgb_1": rng.rand(batch, R, R, 3).astype(np.float32),
            "rgb_2": rng.rand(batch, R, R, 3).astype(np.float32),
            "rgb_vggt": rng.rand(batch, 2, V, V, 3).astype(np.float32),
        }
    if tiny:
        H, W = 64, 96
    else:
        H, W = (336, 512) if cfg.dataset == "scannetpp" else (384, 512)
    out = {
        "rgb_1": rng.rand(batch, R, R, 3).astype(np.float32),
        "rgb_2": rng.rand(batch, R, R, 3).astype(np.float32),
        "rgb_mast3r_1": (rng.rand(batch, H, W, 3) * 2 - 1).astype(np.float32),
        "rgb_mast3r_2": (rng.rand(batch, H, W, 3) * 2 - 1).astype(np.float32),
        "intrinsic": np.tile(
            np.array([[W / 2.0, 0, W / 2], [0, W / 2.0, H / 2], [0, 0, 1]],
                     np.float32), (batch, 1, 1),
        ),
    }
    if cfg.dataset == "objaverse":
        out["depth_1"] = rng.rand(batch, R, R).astype(np.float32)
        out["depth_2"] = rng.rand(batch, R, R).astype(np.float32)
    return out


if __name__ == "__main__":
    main()
