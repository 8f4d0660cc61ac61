"""Aux subsystems: profiler timers, vis dumps, synthetic data sanity."""
import os

import numpy as np

from gd3d.core.profiler import StepTimer
from gd3d.data.synthetic import synthetic_me_batch
from gd3d.utils.vis import (
    vis_attn_map,
    visualize_depth_maps,
    visualize_matching_pairs,
    visualize_tracking_results,
)


def test_step_timer():
    t = StepTimer(warmup=1)
    import time

    for _ in range(4):
        with t.step():
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 4
    assert 0.005 < s["mean_s"] < 0.1
    assert "steps_per_sec" in s


def test_vis_dumps(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(32, 48, 3)
    kp = rng.rand(6, 2) * 30

    p = visualize_matching_pairs(img, img, kp, kp, 0, 0, str(tmp_path / "m"))
    assert os.path.exists(p)
    p = visualize_depth_maps(rng.rand(32, 48), rng.rand(32, 48), 0, 0,
                             str(tmp_path / "d"))
    assert os.path.exists(p)
    attn = np.abs(rng.rand(6, 6))  # 2x3 patch grid at p=16 for 32x48
    p = vis_attn_map(attn, img, img, 0, p_size=16, save_path=str(tmp_path / "a"),
                     num_vis=2)
    assert os.path.exists(p)
    frames = rng.rand(2, 32, 48, 3)
    trajs = {0: rng.rand(3, 2, 2) * 30}
    occs = {0: np.zeros((3, 2), bool)}
    paths = visualize_tracking_results(frames, trajs, occs, str(tmp_path / "t"))
    assert len(paths) == 2 and all(os.path.exists(x) for x in paths)


def test_synthetic_geometry_consistency():
    """Positives exist: matched indices share object-frame 3D points."""
    b = synthetic_me_batch(0, batch=2, img=64, n_kps=32)
    np.testing.assert_allclose(b["pts3d_1"], b["pts3d_2"])
    assert b["valid_1"].any() and b["valid_2"].any()
    assert b["rgb_1"].shape == (2, 64, 64, 3)
