"""Visual-debug dumps (gd3d/utils/vis.py) actually write valid images.

The reference's manual-inspection hooks (utils/vis_utils.py:170/269/313/382)
have no output contract beyond "a file appears"; these tests pin that each
dump function produces a readable non-empty image at the expected path.
"""
import numpy as np

from gd3d.utils.vis import (
    vis_attn_map,
    visualize_depth_maps,
    visualize_matching_pairs,
    visualize_tracking_results,
)


def _readable(path):
    import cv2

    img = cv2.imread(str(path))
    assert img is not None and img.size > 0, path
    return img


def test_visualize_matching_pairs(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64, 3)
    kp = rng.rand(10, 2) * [60, 44]
    valid = np.asarray([True] * 7 + [False] * 3)
    p = visualize_matching_pairs(
        img, img[::-1], kp, kp + 1, epoch=1, batch_idx=2,
        output_dir=str(tmp_path), valid=valid)
    assert p.endswith("match_epoch1_batch2.png")
    _readable(p)


def test_visualize_depth_maps(tmp_path):
    rng = np.random.RandomState(1)
    p = visualize_depth_maps(
        rng.rand(32, 40), rng.rand(32, 40), epoch=3, batch_idx=0,
        output_dir=str(tmp_path))
    _readable(p)


def test_vis_attn_map(tmp_path):
    rng = np.random.RandomState(2)
    H = W = 64
    hw = (H // 16) * (W // 16)
    p = vis_attn_map(
        rng.rand(hw, hw), rng.rand(H, W, 3), rng.rand(H, W, 3),
        count=5, save_path=str(tmp_path), num_vis=2)
    img = _readable(p)
    # 2 rows of side-by-side (source | target) panels
    assert img.shape == (2 * H, 2 * W, 3)


def test_visualize_tracking_results(tmp_path):
    rng = np.random.RandomState(3)
    T, N = 3, 5
    images = rng.rand(T, 32, 48, 3)
    trajs = {0: rng.rand(N, T, 2) * [40, 24]}
    occ = {0: rng.rand(N, T) > 0.5}
    paths = visualize_tracking_results(images, trajs, occ, str(tmp_path))
    assert len(paths) == T
    for p in paths:
        _readable(p)


def test_html_viewer_writes_standalone_page(tmp_path):
    from gd3d.utils.html_viewer import write_html_viewer

    rng = np.random.RandomState(0)
    path = write_html_viewer(
        str(tmp_path / "scene.html"),
        rng.randn(500, 3), rng.randint(0, 255, (500, 3)),
        np.tile(np.eye(4), (3, 1, 1)), np.array([300.0, 300.0, 300.0]),
        max_points=200)
    s = open(path).read()
    assert "<canvas" in s and "PTS = [" in s and "CAMS = [" in s
    assert "200 points, 3 cameras" in s
    # subsampled payload: 200 pts x 6 floats
    import json as _json
    pts = _json.loads(s.split("PTS = ")[1].split(";")[0])
    assert len(pts) == 200 * 6
