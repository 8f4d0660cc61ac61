"""Offline dataset renderer CLI.

Reference equivalent: data_utils/render_objects.py:11-44 — a multiprocessing
driver that renders each Objaverse object into a color_/depth_/mask_%06d.png
tree with the 42 fixed poses (data/obj_poses.npy) and fixed intrinsics via
BlenderProc (data_utils/blenderproc.py:13-87).

This image has no Blender, so objects are procedural meshes
(gd3d/data/render_synthetic.py — same z-buffer output contract: depth in mm
uint16, mask uint8, identical pose set); point --objects at a name list to
control the tree layout. The emitted tree is directly consumable by the
Objaverse datasets (gd3d/data/objaverse.py).
"""
from __future__ import annotations

import argparse
import multiprocessing
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Render procedural object trees (BlenderProc-stage "
                    "substitute)")
    p.add_argument("--output", required=True, help="dataset root to write")
    p.add_argument("--num-objects", type=int, default=8,
                   help="number of procedural objects (ignored with "
                        "--objects)")
    p.add_argument("--objects", default=None,
                   help="text file of object names, one per line (the "
                        "reference's 10k.txt analogue)")
    p.add_argument("--glb-root", default=None,
                   help="directory of <name>.glb assets (the reference's "
                        "--cad_root, render_objects.py:33); names come from "
                        "--objects or every *.glb under the root. Without "
                        "it, objects are procedural meshes")
    p.add_argument("--views", type=int, default=42,
                   help="views per object (reference: 42 fixed poses)")
    p.add_argument("--size", type=int, default=512,
                   help="render resolution (reference: 512)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--poses", default=None, metavar="NPY",
                   help="camera extrinsics .npy to render with — e.g. the "
                        "vendored data/obj_poses.npy, the reference's exact "
                        "42 BlenderProc poses (default: procedural "
                        "Fibonacci-sphere poses)")
    p.add_argument("--workers", type=int, default=0,
                   help="process pool size (render_objects.py uses "
                        "multiprocessing); 0 = in-process")
    return p.parse_args(argv)


def _render_chunk(args_tuple):
    out_dir, names, views, size, seed, glb_root, poses = args_tuple
    from gd3d.data.render_synthetic import render_object_tree

    return render_object_tree(
        out_dir, names, n_views=views, size=size, seed=seed,
        glb_root=glb_root, poses=poses)


def main(argv=None) -> None:
    args = parse_args(argv)
    if args.objects:
        names = [
            line.strip()
            for line in Path(args.objects).read_text().splitlines()
            if line.strip()
        ]
    elif args.glb_root:
        names = sorted(p.name for p in Path(args.glb_root).glob("*.glb"))
    else:
        names = [f"obj_{i:05d}" for i in range(args.num_objects)]

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    pose_override = np.load(args.poses) if args.poses else None

    if args.workers > 0:
        # contiguous chunks with seed = global start index, so every object
        # gets the same procedural mesh regardless of the worker count
        step = (len(names) + args.workers - 1) // args.workers
        chunks = [
            (str(out), names[i : i + step], args.views, args.size,
             args.seed + i, args.glb_root, pose_override)
            for i in range(0, len(names), step)
        ]
        with multiprocessing.Pool(len(chunks)) as pool:
            all_poses = pool.map(_render_chunk, chunks)
        # every chunk renders the same fixed_poses array; assert that
        # before keeping only the first (silent data loss otherwise)
        assert all_poses and all(
            np.array_equal(p, all_poses[0]) for p in all_poses[1:])
        poses = all_poses[0]
    else:
        poses = _render_chunk(
            (str(out), names, args.views, args.size, args.seed,
             args.glb_root, pose_override))

    # obj_poses.npy next to the tree (reference keeps it in data/)
    np.save(out / "obj_poses.npy", poses)
    print(f"rendered {len(names)} objects x {args.views} views -> {out}")


if __name__ == "__main__":
    main()
