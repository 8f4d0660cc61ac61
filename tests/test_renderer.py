"""Procedural offline renderer: geometric consistency + pipeline interop."""
import numpy as np

from gd3d.data.objaverse import ObjaverseCorrDataset
from gd3d.data.render_synthetic import (
    DEFAULT_INTRINSIC,
    fixed_poses,
    render_object_tree,
)
from gd3d.ops.geometry import img_coord_2_obj_coord


def test_render_tree_and_dataset_roundtrip(tmp_path):
    objs = ["000-000/obj0"]
    poses = render_object_tree(str(tmp_path), objs, n_views=3, size=128)
    d = tmp_path / objs[0]
    assert (d / "color_000000.png").exists()
    assert (d / "depth_000002.png").exists()

    # the rendered tree feeds the reference-layout dataset directly; note
    # the renderer writes 128^2 here while the intrinsics assume 512^2, so
    # build a scaled intrinsic for the geometry check below instead.
    ds = ObjaverseCorrDataset(str(tmp_path), objs, poses, num_kps=64,
                              length=4, seed=0)
    s = ds[0]
    assert s["pts3d_1"].shape == (64, 3)


def test_render_multiview_3d_consistency(tmp_path):
    """Object-frame 3D lifted from two rendered views must agree: points of
    view A and view B sample the same surface."""
    import cv2

    objs = ["o/x"]
    size = 256
    K = DEFAULT_INTRINSIC.copy()
    K[:2] *= size / 512.0
    # render at 256 with matching K by scaling the tree manually
    from gd3d.data.render_synthetic import procedural_object, render_mesh

    rng = np.random.RandomState(0)
    verts, faces, colors = procedural_object(rng)
    poses = fixed_poses(4)
    pts_sets = []
    for i in range(2):
        rgb, depth, mask = render_mesh(verts, faces, colors, poses[i], K, size)
        ys, xs = np.where(mask)
        sel = rng.choice(len(ys), 200, replace=False)
        kp = np.stack([xs[sel], ys[sel]], -1).astype(float)
        pts3d = img_coord_2_obj_coord(kp, depth, K, poses[i])
        pts_sets.append(pts3d)

    # every lifted point must lie near the object surface (vertex cloud)
    for pts in pts_sets:
        d = np.linalg.norm(
            pts[:, None, :] - verts[None, :, :], axis=-1
        ).min(1)
        # vertex cloud is sparse (icosphere-2); mid-face points sit up to
        # ~half an edge length away
        assert np.median(d) < 0.06, np.median(d)


def test_render_cli_writes_tree_and_poses(tmp_path):
    """gd3d-render (render_objects.py equivalent): tree layout + pose file,
    and the multiprocessing path produces identical pixels to in-process."""
    from gd3d.cli.render import main
    import numpy as np

    out_a = tmp_path / "a"
    main(["--output", str(out_a), "--num-objects", "2", "--views", "3",
          "--size", "64"])
    poses = np.load(out_a / "obj_poses.npy")
    assert poses.shape == (3, 4, 4)
    for name in ("obj_00000", "obj_00001"):
        for i in range(3):
            for kind in ("color", "depth", "mask"):
                assert (out_a / name / f"{kind}_{i:06d}.png").exists()

    out_b = tmp_path / "b"
    main(["--output", str(out_b), "--num-objects", "2", "--views", "3",
          "--size", "64", "--workers", "2"])
    import cv2

    a = cv2.imread(str(out_a / "obj_00001" / "color_000001.png"))
    b = cv2.imread(str(out_b / "obj_00001" / "color_000001.png"))
    np.testing.assert_array_equal(a, b)
