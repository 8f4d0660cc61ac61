"""Visual localization CLI: query images -> poses in an aligned scene.

Reference equivalent: dust3r's visloc flow (dust3r/visloc.py — pairwise
inference vs map views, matches lifted to the scene's 3D points, PnP).
Consumes the scene.npz written by gd3d-align and writes query_poses.npz.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Localize query images against a gd3d-align scene")
    p.add_argument("--scene", required=True,
                   help="scene.npz from gd3d-align (needs images/pts3d)")
    p.add_argument("--images", required=True, nargs="+",
                   help="query image files (or one directory)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--teacher-ckpt", default=None,
                   help="MASt3R torch state_dict (.pth)")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--top-k", type=int, default=None,
                   help="limit map views per query (default: all)")
    p.add_argument("--min-conf", type=float, default=1.5,
                   help="scene-confidence gate for matched map pixels")
    p.add_argument("--reproj-px", type=float, default=5.0,
                   help="PnP RANSAC reprojection error (visloc.py default)")
    p.add_argument("--coarse-to-fine", action="store_true",
                   help="second matching pass through crop windows of the "
                        "native-resolution query (mast3r coarse_to_fine)")
    p.add_argument("--fine-size", type=int, default=None,
                   help="long side for the fine-pass query (default 2x "
                        "--size)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random teacher (CI smoke)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from gd3d.cli.align import _collect_images
    from gd3d.data.images import load_image_mast3r
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.teachers.mast3r import Mast3rTeacher
    from gd3d.visloc import localize_image

    z = np.load(args.scene)
    scene_images = z["images"]          # (n, H, W, 3) in [-1, 1]
    scene_pts3d = z["pts3d"]
    scene_conf = z.get("confidence")
    if scene_pts3d.ndim != 4:
        raise SystemExit("--scene must be a DENSE scene.npz "
                         "(gd3d-align --sparse 0)")
    if scene_conf is not None:  # stored flat (n, H*W) by gd3d-align
        scene_conf = scene_conf.reshape(scene_pts3d.shape[:3])

    files = _collect_images(args.images)
    if args.tiny:
        tcfg = Mast3rConfig(
            croco=CrocoConfig(
                patch_size=16, enc_embed_dim=32, enc_depth=2,
                enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                dec_num_heads=2),
            local_feat_dim=6, dpt_feature_dim=16, dpt_last_dim=8)
    else:
        tcfg = Mast3rConfig()
    teacher = Mast3rTeacher(tcfg)
    if args.teacher_ckpt:
        from gd3d.teachers.convert import load_torch_state
        from gd3d.teachers.mast3r import convert_mast3r

        params = convert_mast3r(load_torch_state(args.teacher_ckpt))
    else:
        print("WARNING: no --teacher-ckpt; random MASt3R weights")
        params = teacher.init_params(
            jax.random.key(0), hw=tuple(scene_images.shape[1:3]))

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    poses, names, n_matches = [], [], []
    fine_size = args.fine_size or 2 * args.size
    for f in files:
        img = load_image_mast3r(str(f), size=args.size)["img"]
        assert img.shape == scene_images.shape[1:], (
            f"query {f} resizes to {img.shape}, scene is "
            f"{scene_images.shape[1:]} — use matching aspect/size")
        hires = (load_image_mast3r(str(f), size=fine_size)["img"]
                 if args.coarse_to_fine else None)
        res = localize_image(
            teacher, params, jnp.asarray(img), scene_images, scene_pts3d,
            scene_conf, top_k=args.top_k, min_conf=args.min_conf,
            reproj_px=args.reproj_px,
            coarse_to_fine=args.coarse_to_fine, query_hires=hires)
        poses.append(res["pose"])
        names.append(str(f))
        n_matches.append(res["n_matches"])
        print(f"{f}: {res['n_matches']} matches, t="
              f"{np.round(res['pose'][:3, 3], 3)}")
    np.savez(outdir / "query_poses.npz",
             poses=np.stack(poses), names=np.asarray(names),
             n_matches=np.asarray(n_matches))
    print(f"localized {len(files)} queries -> {outdir / 'query_poses.npz'}")


if __name__ == "__main__":
    main()
