"""Offline procedural renderer — the BlenderProc stage equivalent.

The reference generates its Objaverse training trees with a BlenderProc
driver (data_utils/render_objects.py:11-44 -> blenderproc.py:13-87): 42
fixed poses (data/obj_poses.npy), fixed intrinsics, 512^2 RGB + 16-bit
depth in millimetres + binary mask per view, files color_/depth_/mask_%06d.png.

Blender is not available in this image, so this module provides a
self-contained z-buffer triangle rasterizer over procedural meshes
(icospheres/boxes with vertex colors) that writes the SAME tree layout and
units — the full ME/MASt3R/VGGT Objaverse pipeline then runs end-to-end on
generated data.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Tuple

import numpy as np

DEFAULT_INTRINSIC = np.array(
    [[35 * 512 / 32.0, 0.0, 256.0], [0.0, 35 * 512 / 32.0, 256.0],
     [0.0, 0.0, 1.0]]
)  # data_utils/dataset.py:38-40


def fixed_poses(n: int = 42, radius: float = 2.0,
                seed: int = 0) -> np.ndarray:
    """n camera extrinsics (4x4 world->cam) on a sphere looking at origin —
    the analogue of data/obj_poses.npy."""
    rng = np.random.RandomState(seed)
    poses = []
    for i in range(n):
        # Fibonacci sphere directions for even coverage
        z = 1 - 2 * (i + 0.5) / n
        r = np.sqrt(max(0.0, 1 - z * z))
        phi = i * np.pi * (3 - np.sqrt(5.0))
        cam_pos = radius * np.array([r * np.cos(phi), r * np.sin(phi), z])
        fwd = -cam_pos / np.linalg.norm(cam_pos)
        up = np.array([0.0, 0.0, 1.0])
        if abs(np.dot(up, fwd)) > 0.99:
            up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])  # rows: cam axes in world
        t = -R @ cam_pos
        E = np.eye(4)
        E[:3, :3] = R
        E[:3, 3] = t
        poses.append(E)
    return np.stack(poses)


def icosphere(subdiv: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    t = (1.0 + 5**0.5) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        float,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    for _ in range(subdiv):
        new_faces = []
        verts = list(map(np.array, verts))
        cache = {}

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (verts[a] + verts[b]) / 2
                m = m / np.linalg.norm(m)
                verts.append(m)
                cache[key] = len(verts) - 1
            return cache[key]

        for f in faces:
            a, b, c = f
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.stack(verts)
        faces = np.array(new_faces)
    return verts, faces


def procedural_object(rng: np.random.RandomState
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random bumpy sphere with per-vertex colors, radius ~0.3."""
    verts, faces = icosphere(2)
    bump = 1.0 + 0.25 * np.sin(
        verts @ rng.randn(3, 3) * 3.0
    ).sum(-1) / 3.0
    verts = verts * bump[:, None] * (0.25 + 0.1 * rng.rand())
    colors = 0.2 + 0.8 * np.abs(np.sin(verts * 17 + rng.rand(3) * 6))
    return verts, faces, colors


def render_mesh(
    verts: np.ndarray, faces: np.ndarray, colors: np.ndarray,
    extrinsic: np.ndarray, K: np.ndarray, size: int = 512,
    normals: np.ndarray = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Z-buffer rasterization -> (rgb uint8, depth float meters, mask bool).

    With `normals` (world-space vertex normals), colors are Lambert-shaded
    under the reference's camera-fixed light rig (blenderproc.py:21-35; see
    gd3d/data/glb.py::shade_lambert) — used for real .glb assets where flat
    vertex colors read as silhouettes. Dispatches to the native C++
    rasterizer (gd3d_rasterize_mesh) when built; the numpy loop below is the
    parity fallback.
    """
    cam = verts @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    if normals is not None:
        import os

        from gd3d.data.glb import (
            _LIGHTS_CAM,
            light_visibility,
            shade_lambert,
        )

        cam_normals = normals @ extrinsic[:3, :3].T
        # shadow-mapped visibility per light (the reference's path tracer
        # casts shadows; GD3D_RENDER_SHADOWS=0 restores plain Lambert)
        vis = None
        if os.environ.get("GD3D_RENDER_SHADOWS", "1") != "0":
            vis = np.stack([light_visibility(cam, faces, lp)
                            for lp in _LIGHTS_CAM])
        colors = shade_lambert(cam, cam_normals,
                               np.asarray(colors, np.float32),
                               visibility=vis)

    from gd3d import native_runtime

    native = native_runtime.rasterize_mesh(cam, faces, colors, K, size, size)
    if native is not None:
        rgb_f, depth = native
        mask = np.isfinite(depth)
        depth = np.where(mask, depth, 0.0)
        return (np.clip(rgb_f, 0, 1) * 255).astype(np.uint8), depth, mask

    z = cam[:, 2]
    uv = cam @ K.T
    uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-8)

    rgb = np.zeros((size, size, 3), np.float32)
    depth = np.full((size, size), np.inf, np.float32)

    for f in faces:
        tz = z[f]
        if (tz <= 0.05).any():
            continue
        tri = uv[f]
        lo = np.maximum(np.floor(tri.min(0)).astype(int), 0)
        hi = np.minimum(np.ceil(tri.max(0)).astype(int) + 1, size)
        if (hi <= lo).any():
            continue
        xs = np.arange(lo[0], hi[0])
        ys = np.arange(lo[1], hi[1])
        gx, gy = np.meshgrid(xs, ys)
        p = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float64) + 0.5
        v0, v1, v2 = tri
        d = (v1[1] - v2[1]) * (v0[0] - v2[0]) + (v2[0] - v1[0]) * (v0[1] - v2[1])
        if abs(d) < 1e-12:
            continue
        w0 = ((v1[1] - v2[1]) * (p[:, 0] - v2[0])
              + (v2[0] - v1[0]) * (p[:, 1] - v2[1])) / d
        w1 = ((v2[1] - v0[1]) * (p[:, 0] - v2[0])
              + (v0[0] - v2[0]) * (p[:, 1] - v2[1])) / d
        w2 = 1 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        w = np.stack([w0, w1, w2], -1)[inside]
        pz = 1.0 / (w @ (1.0 / tz))  # perspective-correct depth
        px = p[inside].astype(int)
        flat = px[:, 1] * size + px[:, 0]
        closer = pz < depth.ravel()[flat]
        flat = flat[closer]
        if flat.size == 0:
            continue
        col = (w[closer] * (1.0 / tz[None])) @ colors[f] * pz[closer, None]
        depth.ravel()[flat] = pz[closer]
        rgb.reshape(-1, 3)[flat] = col

    mask = np.isfinite(depth)
    depth = np.where(mask, depth, 0.0)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8), depth, mask


def render_object_tree(
    out_dir: str,
    obj_names: List[str],
    n_views: int = 42,
    size: int = 512,
    seed: int = 0,
    glb_root: str = None,
    poses: np.ndarray = None,
) -> np.ndarray:
    """Write color_/depth_/mask_%06d.png trees + return the pose array
    (blenderproc.py layout: depth in mm uint16, mask uint8).

    With `glb_root`, each name resolves to `<glb_root>/<name>.glb` — the
    reference's cad_root layout (render_objects.py:33-41) — loaded by
    gd3d/data/glb.py, unit-box normalized (blenderproc.py:42-59) and
    Lambert-shaded; otherwise objects are procedural meshes."""
    import cv2

    if poses is None:
        poses = fixed_poses(n_views)
    else:
        poses = np.asarray(poses)[:n_views]
        assert poses.shape == (n_views, 4, 4), poses.shape
    K = DEFAULT_INTRINSIC * (size / 512.0)
    K[2, 2] = 1.0
    for oi, name in enumerate(obj_names):
        normals = None
        if glb_root is not None:
            from gd3d.data import glb as glb_mod

            path = Path(glb_root) / (
                name if name.endswith(".glb") else name + ".glb")
            mesh = glb_mod.load_glb(path)
            verts = glb_mod.normalize_unit_box(mesh.verts)
            faces, colors = mesh.faces, mesh.colors
            normals = glb_mod.vertex_normals(verts, faces)
        else:
            rng = np.random.RandomState(seed + oi)
            verts, faces, colors = procedural_object(rng)
        # strip only a .glb suffix: names may be nested ("000-000/obj0")
        d = Path(out_dir) / (name[:-4] if name.endswith(".glb") else name)
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_views):
            rgb, depth, mask = render_mesh(
                verts, faces, colors, poses[i], K, size, normals=normals
            )
            cv2.imwrite(str(d / f"color_{i:06d}.png"), rgb[..., ::-1])
            cv2.imwrite(
                str(d / f"depth_{i:06d}.png"),
                (depth * 1000).astype(np.uint16),
            )
            cv2.imwrite(
                str(d / f"mask_{i:06d}.png"), mask.astype(np.uint8) * 255
            )
    return poses
