"""COLMAP text-model export (gd3d/colmap_export.py)."""
import numpy as np

from gd3d.colmap_export import export_colmap_text
from tests.test_global_align import FOCAL, H, W, _make_scene, global_align


def test_colmap_export_roundtrips_poses(tmp_path):
    scene, gt_poses, _ = _make_scene()
    out = global_align(scene, niter=30)
    npo = {k: np.asarray(out[k])
           for k in ("poses", "focals", "principal_points", "pts3d")}
    export_colmap_text(npo, str(tmp_path), max_points=500)

    cams = [ln.split() for ln in (tmp_path / "cameras.txt").read_text()
            .splitlines() if not ln.startswith("#")]
    assert len(cams) == 4 and cams[0][1] == "PINHOLE"
    assert abs(float(cams[0][4]) - float(npo["focals"][0])) < 1e-4

    # images.txt: world->cam quaternions must invert back to cam2world
    img_lines = [ln.split() for ln in (tmp_path / "images.txt").read_text()
                 .splitlines() if ln and not ln.startswith("#")]
    img_lines = [l for l in img_lines if len(l) >= 10]
    assert len(img_lines) == 4
    from gd3d.models.vggt.heads import quat_to_mat
    import jax.numpy as jnp

    for i, l in enumerate(img_lines):
        qw, qx, qy, qz = map(float, l[1:5])
        t = np.asarray(list(map(float, l[5:8])))
        R = np.asarray(quat_to_mat(jnp.asarray([qx, qy, qz, qw])))
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ t
        np.testing.assert_allclose(c2w, np.asarray(npo["poses"][i]),
                                   atol=1e-4)

    pts = [ln.split() for ln in (tmp_path / "points3D.txt").read_text()
           .splitlines() if not ln.startswith("#")]
    assert len(pts) == 4 * H * W  # all points (fewer than max_points)
    assert all(len(p) == 8 for p in pts)  # id xyz rgb error, empty track
