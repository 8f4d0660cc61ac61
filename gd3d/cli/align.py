"""Multi-view reconstruction CLI: MASt3R pairs -> global alignment.

Reference equivalent: the dust3r demo/reconstruction flow (load_images ->
make_pairs -> inference -> global_aligner(PointCloudOptimizer) ->
compute_global_alignment, dust3r/demo.py + cloud_opt/) — the user-facing
path for turning a handful of photos into posed cameras + a fused point
cloud. Outputs an .npz (poses/focals/depthmaps/pts3d/confidence) and an
optional colored .ply.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Globally align MASt3R pairwise predictions into a "
                    "posed multi-view scene")
    p.add_argument("--images", required=True, nargs="+",
                   help="image files (or one directory) — all must share "
                        "one post-resize shape")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--teacher-ckpt", default=None,
                   help="MASt3R torch state_dict (.pth); random weights "
                        "with a warning otherwise")
    p.add_argument("--size", type=int, default=512,
                   help="MASt3R long-side resize (512 or 224)")
    p.add_argument("--niter", type=int, default=300)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--schedule", choices=("cosine", "linear"),
                   default="cosine")
    p.add_argument("--pairs", default="complete",
                   help="scene graph (dust3r make_pairs strategies): "
                        "complete | swin-W[-noncyclic] | "
                        "logwin-W[-noncyclic] | oneref-R; 'sliding' is an "
                        "alias for swin-2-noncyclic")
    p.add_argument("--pair-filter", default=None, metavar="seqN|cycN",
                   help="drop edges more than N frames apart "
                        "(cyclic distance with cycN)")
    p.add_argument("--sparse", type=int, default=-1, metavar="K",
                   help="optimize only the top-K most confident anchor "
                        "pixels per image (MASt3R sparse-GA analogue; "
                        "~HW/K x cheaper, sparse depth outputs). Default "
                        "-1 = auto: sparse 1024 when the scene exceeds "
                        "200k dense points (dense cold-compiles in "
                        "minutes on a small host); 0 forces dense")
    p.add_argument("--sparse-ga", action="store_true",
                   help="use the reference's TWO-STAGE MASt3R sparse "
                        "global alignment (gd3d/sparse_ga.py; "
                        "mast3r/cloud_opt/sparse_ga.py parity: canonical "
                        "pointmaps, kinematic-chain cameras, coarse "
                        "3D-matching stage then fine 2D-reprojection "
                        "stage) instead of the PointCloudOptimizer loop; "
                        "depth/pointmaps are densified from the optimized "
                        "anchors. --niter/--lr/--sparse/--tsdf/--colmap* "
                        "apply to the default path only")
    p.add_argument("--ga-niter1", type=int, default=500,
                   help="--sparse-ga coarse-stage iterations")
    p.add_argument("--ga-niter2", type=int, default=500,
                   help="--sparse-ga fine-stage iterations (0 skips)")
    p.add_argument("--ga-subsample", type=int, default=8,
                   help="--sparse-ga anchor-grid stride")
    p.add_argument("--tsdf", type=float, default=0.0, metavar="THRESH",
                   help="TSDF depth refinement after alignment (MASt3R "
                        "TSDFPostProcess analogue; dense scenes only; "
                        "THRESH ~ the expected depth noise scale)")
    p.add_argument("--tsdf-samples", type=int, default=128,
                   help="candidate depths per pixel for --tsdf")
    p.add_argument("--colmap", action="store_true",
                   help="also export the scene as a COLMAP text model "
                        "(cameras/images/points3D.txt; dense scenes only)")
    p.add_argument("--colmap-db", action="store_true",
                   help="also write a COLMAP matching database "
                        "(database.db: reciprocal-NN correspondences as "
                        "keypoints/matches + pose/intrinsic priors — run "
                        "COLMAP's point_triangulator/BA on top)")
    p.add_argument("--db-subsample", type=int, default=8,
                   help="correspondence grid stride for --colmap-db")
    p.add_argument("--min-len-track", type=int, default=2,
                   help="drop --colmap-db tracks with fewer observations")
    p.add_argument("--ply", action="store_true",
                   help="also write a confidence-filtered colored "
                        "pointcloud.ply")
    p.add_argument("--html", action="store_true",
                   help="also write scene.html — a self-contained "
                        "browser viewer (points + camera frusta, no "
                        "server/deps; the headless gradio-demo analogue)")
    p.add_argument("--min-conf", type=float, default=1.5,
                   help="confidence threshold for the .ply export")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random teacher (CI smoke)")
    return p.parse_args(argv)


def _collect_images(paths):
    exts = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
    if len(paths) == 1 and Path(paths[0]).is_dir():
        return sorted(
            p for p in Path(paths[0]).iterdir() if p.suffix.lower() in exts)
    return [Path(p) for p in paths]


def main(argv=None) -> None:
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from gd3d.align import global_align, scene_from_mast3r
    from gd3d.data.images import load_image_mast3r
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.teachers.mast3r import Mast3rTeacher

    files = _collect_images(args.images)
    assert len(files) >= 2, "need at least two images"
    loaded = [load_image_mast3r(str(f), size=args.size) for f in files]
    shapes = {tuple(x["img"].shape) for x in loaded}
    assert len(shapes) == 1, (
        f"all images must share one post-resize shape, got {shapes} — "
        "align same-aspect-ratio groups separately")
    images = jnp.asarray(np.stack([x["img"] for x in loaded]), jnp.float32)

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
            jax.random.key(0), hw=tuple(images.shape[1:3]))

    n = images.shape[0]
    from gd3d.data.scene_graph import make_pair_indices

    graph = "swin-2-noncyclic" if args.pairs == "sliding" else args.pairs
    if graph == "complete" and args.pair_filter is None:
        pairs = None  # scene_from_mast3r's complete-graph fast path
    else:
        pairs = make_pair_indices(n, graph, prefilter=args.pair_filter)
    if args.sparse_ga:
        _run_sparse_ga(args, teacher, params, images, pairs, files)
        return
    desc_i = desc_j = None
    if args.colmap_db:
        scene, desc_i, desc_j = scene_from_mast3r(
            teacher, params, images, pairs=pairs, return_desc=True)
    else:
        scene = scene_from_mast3r(teacher, params, images, pairs=pairs)
    sparse_k = args.sparse
    if sparse_k < 0:  # auto: dense only for small scenes
        H_im, W_im = scene.hw
        sparse_k = 1024 if n * H_im * W_im > 200_000 else 0
        if sparse_k:
            print(f"auto-selected sparse anchors (k={sparse_k}); "
                  "pass --sparse 0 to force dense")
    if sparse_k > 0:
        from gd3d.align import sparse_from_scene

        scene = sparse_from_scene(scene, k=sparse_k)
    out = global_align(
        scene, niter=args.niter, lr=args.lr, schedule=args.schedule)
    if args.tsdf > 0:
        if scene.pix is not None:
            print("WARNING: --tsdf needs dense depth maps; skipping "
                  "(rerun with --sparse 0)")
        else:
            from gd3d.tsdf import tsdf_refine

            out = tsdf_refine(scene, out, thresh=args.tsdf,
                              nsamples=args.tsdf_samples)
            print(f"TSDF-refined depthmaps (thresh={args.tsdf})")

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    P = scene.pred_i.shape[1]
    conf = np.zeros((n, P), np.float32)
    for e, (i, _) in enumerate(scene.edges):
        conf[int(i)] = np.maximum(
            conf[int(i)], np.asarray(scene.conf_i[e]).reshape(P))
    np.savez(
        outdir / "scene.npz",
        poses=np.asarray(out["poses"]),
        focals=np.asarray(out["focals"]),
        principal_points=np.asarray(out["principal_points"]),
        depthmaps=np.asarray(out["depthmaps"]),
        pts3d=np.asarray(out["pts3d"]),
        confidence=conf,
        images=np.asarray(images),
        losses=np.asarray(out["losses"]),
    )
    print(f"aligned {n} images in {len(scene.edges)} pairs; final loss "
          f"{float(out['losses'][-1]):.4f} -> {outdir / 'scene.npz'}")

    if args.colmap:
        if scene.pix is not None:
            print("WARNING: --colmap needs a dense scene; skipping")
        else:
            from gd3d.colmap_export import export_colmap_text

            export_colmap_text(
                {k: np.asarray(v) for k, v in out.items()
                 if k in ("poses", "focals", "principal_points", "pts3d")},
                str(outdir / "colmap"), images=np.asarray(images),
                confidence=conf, min_conf=args.min_conf,
                image_names=[Path(f).name for f in files])
            print(f"COLMAP text model -> {outdir / 'colmap'}")

    if args.colmap_db:
        import jax.numpy as _jnp

        from gd3d.colmap_db import write_colmap_database
        from gd3d.distill.keypoints import reciprocal_nn_grid

        H_im, W_im = scene.hw
        matches = {}
        for e, (i, j) in enumerate(map(tuple, scene.edges)):
            i, j = int(i), int(j)
            if i >= j:  # one direction per unordered pair
                continue
            xy1, xy2, ok = reciprocal_nn_grid(
                _jnp.asarray(desc_i[e]), _jnp.asarray(desc_j[e]),
                H_im, W_im, subsample=args.db_subsample)
            xy1, xy2, ok = map(np.asarray, (xy1, xy2, ok))
            xy1, xy2 = xy1[ok], xy2[ok]
            px1 = np.stack([xy1 % W_im, xy1 // W_im], -1).astype(np.float32)
            px2 = np.stack([xy2 % W_im, xy2 // W_im], -1).astype(np.float32)
            matches[(i, j)] = (px1 + 0.5, px2 + 0.5)  # pixel centers
        stats = write_colmap_database(
            str(outdir / "database.db"),
            [Path(f).name for f in files], scene.hw, matches,
            focals=np.asarray(out["focals"]),
            principal_points=np.asarray(out["principal_points"]),
            poses_c2w=np.asarray(out["poses"]),
            min_len_track=args.min_len_track)
        print(f"COLMAP database: {stats['images']} images, "
              f"{stats['keypoints']} keypoints, {stats['matches']} matches "
              f"-> {outdir / 'database.db'}")

    if args.ply or args.html:
        pts = np.asarray(out["pts3d"]).reshape(-1, 3)
        rgb = ((np.asarray(images) + 1) * 127.5).clip(0, 255).astype(
            np.uint8).reshape(n, -1, 3)
        if scene.pix is not None:
            W_im = images.shape[2]
            lin = (scene.pix[..., 1] * W_im + scene.pix[..., 0]).astype(int)
            rgb = np.take_along_axis(rgb, lin[..., None], axis=1)
        cols = rgb.reshape(-1, 3)
        keep = conf.reshape(-1) > args.min_conf
        pts, cols = pts[keep], cols[keep]

    if args.html:
        from gd3d.utils.html_viewer import write_html_viewer

        html = write_html_viewer(
            str(outdir / "scene.html"), pts, cols,
            np.asarray(out["poses"]), np.asarray(out["focals"]),
            hw=scene.hw)
        print(f"browser viewer -> {html}")

    if args.ply:
        ply = outdir / "pointcloud.ply"
        with open(ply, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\n"
                f"element vertex {len(pts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
            for p, c in zip(pts, cols):
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} "
                        f"{c[0]} {c[1]} {c[2]}\n")
        print(f"wrote {len(pts)} points -> {ply}")


def _run_sparse_ga(args, teacher, params, images, pairs, files) -> None:
    """The --sparse-ga path: two-stage sparse global alignment + anchor
    densification, writing the same scene.npz/.ply/.html artifacts."""
    from gd3d.sparse_ga import dense_pts3d, sparse_global_alignment

    for flag in ("tsdf", "colmap", "colmap_db"):
        if getattr(args, flag):
            print(f"WARNING: --{flag.replace('_', '-')} applies to the "
                  "dense path; ignored under --sparse-ga")
    n = int(images.shape[0])
    scene, res = sparse_global_alignment(
        teacher, params, images, pairs=pairs,
        subsample=args.ga_subsample,
        niter1=args.ga_niter1, niter2=args.ga_niter2)
    best = res["fine"] if res["fine"] is not None else res["coarse"]
    pts_list, depth_list = dense_pts3d(scene, best)
    K = np.asarray(best["intrinsics"])
    H, W = scene.hw
    pts3d = np.stack(pts_list).astype(np.float32)  # (N, H*W, 3)

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    np.savez(
        outdir / "scene.npz",
        poses=np.asarray(best["cam2w"], np.float32),
        focals=K[:, 0, 0].astype(np.float32),
        principal_points=K[:, :2, 2].astype(np.float32),
        depthmaps=np.stack(depth_list).astype(np.float32),
        pts3d=pts3d,
        images=np.asarray(images),
    )
    stage = "fine" if res["fine"] is not None else "coarse"
    print(f"sparse-GA aligned {n} images ({stage} stage, "
          f"{int(scene.valid.sum())} correspondences) -> "
          f"{outdir / 'scene.npz'}")

    if args.ply or args.html:
        pts = pts3d.reshape(-1, 3)
        cols = ((np.asarray(images) + 1) * 127.5).clip(0, 255).astype(
            np.uint8).reshape(-1, 3)

    if args.html:
        from gd3d.utils.html_viewer import write_html_viewer

        html = write_html_viewer(
            str(outdir / "scene.html"), pts, cols,
            np.asarray(best["cam2w"]), K[:, 0, 0], hw=scene.hw)
        print(f"browser viewer -> {html}")

    if args.ply:
        ply = outdir / "pointcloud.ply"
        with open(ply, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\n"
                f"element vertex {len(pts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
            for p, c in zip(pts, cols):
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} "
                        f"{c[0]} {c[1]} {c[2]}\n")
        print(f"wrote {len(pts)} points -> {ply}")


if __name__ == "__main__":
    main()
