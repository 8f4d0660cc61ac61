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
    p.add_argument("--objective", choices=("mast3r", "croco"),
                   default="mast3r",
                   help="mast3r: ConfLoss(Regr3D) + matching over the "
                        "two-view Mast3r net (the default). croco: masked "
                        "cross-view completion (MaskedMSE) over a "
                        "CrocoPretrain net — the stage that produces the "
                        "trunk DUSt3R starts from (croco/pretrain.py)")
    p.add_argument("--mask-ratio", type=float, default=0.9,
                   help="croco objective: fraction of img1 patches masked")
    p.add_argument("--norm-pix-loss", action="store_true",
                   help="croco objective: per-patch pixel normalization "
                        "of the MSE target (criterion.py:27-31)")
    p.add_argument("--export-dust3r", action="store_true",
                   help="croco objective: also write the trunk remapped "
                        "to the Mast3r/DUSt3R param layout "
                        "(dust3r_trunk.npz) for downstream init")
    p.add_argument("--init-trunk", default=None, metavar="TRUNK_NPZ",
                   help="mast3r objective: initialize the encoder/decoder "
                        "trunk from a dust3r_trunk.npz written by "
                        "'--objective croco --export-dust3r' — the "
                        "CroCo -> DUSt3R checkpoint handoff "
                        "(dust3r/model.py:169-176); heads stay "
                        "freshly initialized")
    p.add_argument("--data-root", default=None, metavar="RENDER_TREE",
                   help="train on an on-disk render tree (gd3d-render "
                        "output / Objaverse renderings: color_/depth_/"
                        "mask_%%06d.png + obj_poses.npy) instead of "
                        "in-process procedural pairs")
    p.add_argument("--co3d-root", default=None, metavar="CO3D_DIR",
                   help="train on a preprocessed Co3D-v2 tree (the "
                        "dust3r pretraining layout: selected_seqs json + "
                        "images/depths/masks) via the stereo-view "
                        "pipeline (gd3d/data/stereo_views.py); --img "
                        "sets the square view resolution")
    p.add_argument("--wildrgbd-root", default=None, metavar="WRGBD_DIR",
                   help="preprocessed WildRGB-D tree (gd3d-preprocess "
                        "--dataset wildrgbd output)")
    p.add_argument("--scannetpp-root", default=None, metavar="SNPP_DIR",
                   help="preprocessed ScanNet++ pretraining dump "
                        "(gd3d-preprocess --dataset scannetpp output)")
    p.add_argument("--arkit-root", default=None, metavar="ARKIT_DIR",
                   help="preprocessed ARKitScenes tree (Training/Test "
                        "subdirs with all_metadata.npz; gd3d-preprocess "
                        "--dataset arkitscenes output)")
    p.add_argument("--blendedmvs-root", default=None, metavar="BMVS_DIR",
                   help="preprocessed BlendedMVS tree (blendedmvs_pairs"
                        ".npy + per-sequence jpg/exr/npz)")
    p.add_argument("--megadepth-root", default=None, metavar="MD_DIR",
                   help="preprocessed MegaDepth tree (all_metadata.npz + "
                        "per-scene jpg/exr/npz)")
    p.add_argument("--staticthings-root", default=None, metavar="ST3D_DIR",
                   help="preprocessed StaticThings3D tree "
                        "(staticthings_pairs.npy + TRAIN/<scene>/<seq>)")
    p.add_argument("--waymo-root", default=None, metavar="WAYMO_DIR",
                   help="preprocessed Waymo Open tree (waymo_pairs.npz + "
                        "per-scene jpg/exr/npz)")
    p.add_argument("--habitat-root", default=None, metavar="HAB_DIR",
                   help="preprocessed Habitat render tree "
                        "(Habitat_<size>_scenes_<split>.txt + per-scene "
                        "jpeg/exr/json 5-view groups)")
    p.add_argument("--habitat-size", type=int, default=1_000_000,
                   help="the <size> in the habitat scene-list filename")
    p.add_argument("--co3d-split", default="train",
                   help="dataset split to index (selected_seqs_<split>"
                        ".json for Co3D/WildRGB-D, Training/Test for "
                        "ARKitScenes, the 90/10 seq split for BlendedMVS, "
                        "the 0015/0022 holdout for MegaDepth; default "
                        "train)")
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

    # clamp BEFORE any dataset is constructed: Co3dViews bakes the view
    # resolution in at __init__, so a later clamp would desync the data
    # from the model's patch grid
    if args.tiny:
        args.img = min(args.img, 64)
        tiny_croco = CrocoConfig(
            patch_size=16, enc_embed_dim=32, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
            dec_num_heads=2)

    from gd3d.data import stereo_views as sv

    # (root value, class, split) — split=... means honor --co3d-split;
    # None means the dataset is splitless (its loader asserts so)
    view_specs = [
        (args.co3d_root, sv.Co3dViews, args.co3d_split),
        (args.wildrgbd_root, sv.WildRGBDViews, args.co3d_split),
        (args.scannetpp_root, sv.ScanNetppViews, "train"),
        (args.arkit_root, sv.ARKitScenesViews, args.co3d_split),
        (args.blendedmvs_root, sv.BlendedMVSViews, args.co3d_split),
        (args.megadepth_root, sv.MegaDepthViews, args.co3d_split),
        (args.staticthings_root, sv.StaticThings3DViews, None),
        (args.waymo_root, sv.WaymoViews, None),
        (args.habitat_root,
         functools.partial(sv.HabitatViews, size=args.habitat_size),
         args.co3d_split),
    ]
    view_specs = [(r, c, s) for r, c, s in view_specs if r]
    if len(view_specs) > 1 or (view_specs and args.data_root):
        raise SystemExit("the --*-root dataset flags and --data-root are "
                         "mutually exclusive")
    if view_specs:
        from gd3d.data.stereo_views import views_pretrain_batch

        # StereoViews keeps the reference's `if self.seed:` quirk (falsy 0
        # -> unseeded rng). Remap ONLY the falsy default so the CLI's
        # --seed 0 still yields reproducible crop jitter, while an
        # explicitly passed nonzero seed is used verbatim (a blanket +1
        # would silently change the data stream of every rerun)
        views_seed = args.seed if args.seed else args.seed + 1
        root, cls, split = view_specs[0]
        views = cls(root, split=split,
                    resolution=(args.img, args.img), seed=views_seed)

        def base_batch(seed, batch_size, img, corres):
            rng = np.random.RandomState(seed)
            idxs = rng.randint(0, len(views), batch_size)
            return views_pretrain_batch(views, idxs, rng, n_corres=corres)
    elif args.data_root:
        base_batch = functools.partial(rendered_pretrain_batch,
                                       args.data_root)
    else:
        base_batch = synthetic_pretrain_batch

    if args.objective == "croco":
        from gd3d.models.croco_pretrain import CrocoPretrain

        ccfg = tiny_croco if args.tiny else CrocoConfig()
        model = CrocoPretrain(ccfg, mask_ratio=args.mask_ratio)
        n_patches = (args.img // ccfg.patch_size) ** 2
        n_mask = int(args.mask_ratio * n_patches)

        def make_batch(seed, batch_size, img, corres):
            b = base_batch(seed, batch_size, img, corres)
            # RandomMask semantics (masking.py:20-25), host-side rng
            noise = np.random.RandomState(seed).rand(batch_size, n_patches)
            mask1 = np.argsort(noise, axis=1, kind="stable") < n_mask
            return {"img1": b["img1"], "img2": b["img2"], "mask1": mask1}
    else:
        if args.tiny:
            cfg = Mast3rConfig(croco=tiny_croco, local_feat_dim=6,
                               dpt_feature_dim=32, dpt_last_dim=16)
        else:
            cfg = Mast3rConfig()
        model = Mast3r(cfg)
        make_batch = base_batch

    batch = make_batch(args.seed, args.batch, args.img, args.corres)
    # jit the init: eager flax init dispatches every param-init op
    # separately (~40 ms each through the axon tunnel — see PERF_NOTES)
    if args.objective == "croco":
        params = jax.jit(model.init)(
            jax.random.key(args.seed), batch["img1"], batch["img2"],
            batch["mask1"])["params"]
    else:
        params = jax.jit(model.init)(
            jax.random.key(args.seed), batch["img1"],
            batch["img2"])["params"]
    if args.init_trunk:
        if args.objective != "mast3r":
            raise SystemExit("--init-trunk applies to the mast3r objective "
                             "(it consumes what --objective croco "
                             "--export-dust3r writes)")
        params = _merge_trunk(params, _load_npz_tree(args.init_trunk))
        print(f"trunk initialized from {args.init_trunk}")
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
    if args.objective == "croco":
        from gd3d.distill.pretrain import build_croco_pretrain_step

        step = build_croco_pretrain_step(
            model, tx, norm_pix_loss=args.norm_pix_loss, mesh=mesh)
    else:
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
                extra = ""
                if "regr3d" in rec:
                    extra = (f"regr={rec['regr3d']:.4f} "
                             f"match={rec['matching']:.4f} ")
                print(f"step {s}: loss={rec['loss']:.4f} {extra}"
                      f"({time.perf_counter() - t0:.1f}s)", flush=True)
            if args.ckpt_every and (s + 1) % args.ckpt_every == 0:
                _save(out_dir / f"params_{s + 1:06d}.npz", params)
                _save_state(out_dir / "state_last.npz",
                            (params, opt_state), s + 1)
    _save(out_dir / "params_final.npz", params)
    if args.objective == "croco" and args.export_dust3r:
        from gd3d.models.croco_pretrain import croco_to_dust3r

        _save(out_dir / "dust3r_trunk.npz", croco_to_dust3r(params))
        print(f"dust3r-layout trunk -> {out_dir / 'dust3r_trunk.npz'}")
    print(f"pretraining finished -> {out_dir}")


def _save(path, params) -> None:
    from flax.traverse_util import flatten_dict

    np.savez(path, **{"/".join(k): np.asarray(v)
                      for k, v in flatten_dict(params).items()})


def _load_npz_tree(path) -> dict:
    from flax.traverse_util import unflatten_dict

    z = np.load(path)
    return unflatten_dict({tuple(k.split("/")): z[k] for k in z.files})


def _merge_trunk(params: dict, trunk: dict) -> dict:
    """Overwrite the Mast3r trunk (encoder/decoder) leaves with a
    CroCo-pretrained tree (croco_to_dust3r layout); heads keep their fresh
    init — the reference's CroCo-checkpoint load semantics
    (dust3r/model.py:169-176)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    for k, v in flatten_dict(trunk).items():
        if k not in flat:
            raise SystemExit(f"trunk key {'/'.join(k)} not in the model — "
                             "was the trunk exported at a different config?")
        if flat[k].shape != v.shape:
            raise SystemExit(f"trunk shape mismatch at {'/'.join(k)}: "
                             f"model {flat[k].shape} vs trunk {v.shape} — "
                             "match the --tiny/--img flags used at export")
        flat[k] = v
    return unflatten_dict(flat)


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
