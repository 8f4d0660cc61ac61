"""gd3d-pretrain: DUSt3R/MASt3R-style two-view pretraining driver.

The reference vendors the pretraining criteria and datasets but strips the
driver (SURVEY row 31); this CLI closes the loop on gd3d's side: dense-GT
pairs come from the in-process procedural renderer or, with --data-root,
from an on-disk render tree (gd3d-render output / Objaverse renderings —
gd3d/data/pretrain_pairs.py), and the composed ConfLoss(Regr3D) +
ConfMatchingLoss objective runs as one jitted program
(gd3d/distill/pretrain.py). Any real dataset with the same dict layout
plugs in the same way.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Pretrain a Mast3r two-view model (regression + "
                    "matching objective) on synthetic dense-GT pairs")
    p.add_argument("--output", required=True)
    p.add_argument("--data-root", default=None, metavar="RENDER_TREE",
                   help="train on an on-disk render tree (gd3d-render "
                        "output / Objaverse renderings: color_/depth_/"
                        "mask_%%06d.png + obj_poses.npy) instead of "
                        "in-process procedural pairs")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--corres", type=int, default=256,
                   help="padded correspondences per pair")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=0, metavar="N",
                   help="linear LR warmup over N steps, then cosine decay "
                        "to 0 at --steps (the public DUSt3R/MASt3R recipe); "
                        "0 = constant LR")
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--matching-weight", type=float, default=0.075)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel mesh size (0 = single device); "
                        "--batch must be divisible by it")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + tiny shapes (CI smoke)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (this image pins "
                        "jax_platforms, so the env var is not enough)")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="save params every N steps (0 = final only); also "
                        "writes the full restart state (state_last.npz)")
    p.add_argument("--resume", default=None, metavar="STATE_NPZ",
                   help="resume from a state_last.npz written by "
                        "--ckpt-every (params + optimizer state + step; "
                        "metrics.jsonl is appended, not truncated)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    import functools

    from gd3d.data.pretrain_pairs import (
        rendered_pretrain_batch,
        synthetic_pretrain_batch,
    )
    from gd3d.distill.pretrain import build_mast3r_pretrain_step
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3r, Mast3rConfig

    if args.data_root:
        make_batch = functools.partial(rendered_pretrain_batch,
                                       args.data_root)
    else:
        make_batch = synthetic_pretrain_batch

    if args.tiny:
        args.img = min(args.img, 64)
        cfg = Mast3rConfig(
            croco=CrocoConfig(patch_size=16, enc_embed_dim=32, enc_depth=2,
                              enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                              dec_num_heads=2),
            local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16)
    else:
        cfg = Mast3rConfig()
    model = Mast3r(cfg)

    batch = make_batch(args.seed, args.batch, args.img, args.corres)
    # jit the init: eager flax init dispatches every param-init op
    # separately (~40 ms each through the axon tunnel — see PERF_NOTES)
    params = jax.jit(model.init)(jax.random.key(args.seed), batch["img1"],
                                 batch["img2"])["params"]
    if args.warmup:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=args.lr, warmup_steps=args.warmup,
            # optax counts decay_steps from step 0 and requires it to
            # exceed the warmup (all-warmup runs happen in short smokes)
            decay_steps=max(args.steps, args.warmup + 1))
    else:
        lr = args.lr
    tx = optax.chain(optax.clip_by_global_norm(args.grad_clip),
                     optax.adamw(lr))
    opt_state = tx.init(params)

    start_step = 0
    if args.resume:
        (params, opt_state), start_step = _load_state(
            args.resume, (params, opt_state))
        print(f"resumed from {args.resume} at step {start_step}")

    mesh = None
    shard = lambda b: b  # noqa: E731
    if args.mesh:
        from gd3d.core.mesh import make_mesh, replicated, shard_batch
        if args.batch % args.mesh:
            raise SystemExit(f"--batch {args.batch} not divisible by "
                             f"--mesh {args.mesh}")
        mesh = make_mesh(n_data=args.mesh)
        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))
        shard = lambda b: shard_batch(mesh, b)  # noqa: E731
    step = build_mast3r_pretrain_step(
        model, tx, loss_kwargs={"matching_weight": args.matching_weight},
        mesh=mesh)

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    # fresh runs truncate (appending would interleave two step-0..
    # streams); resumed runs append and continue the step numbering
    with open(out_dir / "metrics.jsonl",
              "a" if args.resume else "w") as mf:
        for s in range(start_step, args.steps):
            batch = shard(make_batch(
                args.seed + s + 1, args.batch, args.img, args.corres))
            params, opt_state, metrics = step(params, opt_state, batch)
            rec = {"step": s,
                   **{k: round(float(v), 5) for k, v in metrics.items()}}
            if callable(lr):
                rec["lr"] = round(float(lr(s)), 8)
            mf.write(json.dumps(rec) + "\n")
            if s == 0 or (s + 1) % 10 == 0:
                print(f"step {s}: loss={rec['loss']:.4f} "
                      f"regr={rec['regr3d']:.4f} "
                      f"match={rec['matching']:.4f} "
                      f"({time.perf_counter() - t0:.1f}s)", flush=True)
            if args.ckpt_every and (s + 1) % args.ckpt_every == 0:
                _save(out_dir / f"params_{s + 1:06d}.npz", params)
                _save_state(out_dir / "state_last.npz",
                            (params, opt_state), s + 1)
    _save(out_dir / "params_final.npz", params)
    print(f"pretraining finished -> {out_dir}")


def _save(path, params) -> None:
    from flax.traverse_util import flatten_dict

    np.savez(path, **{"/".join(k): np.asarray(v)
                      for k, v in flatten_dict(params).items()})


def _save_state(path, state, step: int) -> None:
    """Full restart state: every (params, opt_state) leaf positionally
    (the tree STRUCTURE is rebuilt from a fresh tx.init at load, so only
    leaves need storing) + the step counter."""
    import jax

    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state)]
    np.savez(path, *leaves, step=np.int64(step))


def _load_state(path, state_template):
    import jax

    z = np.load(path)
    tmpl, treedef = jax.tree_util.tree_flatten(state_template)
    stored = sum(1 for k in z.files if k.startswith("arr_"))
    if stored != len(tmpl):
        raise ValueError(
            f"state layout mismatch: {path} stores {stored} leaves, the "
            f"current model/optimizer has {len(tmpl)} — resume with the "
            "same --tiny/--warmup/--grad-clip flags it was saved with")
    leaves = [z[f"arr_{i}"] for i in range(len(tmpl))]
    return jax.tree_util.tree_unflatten(treedef, leaves), int(z["step"])


if __name__ == "__main__":
    main()
