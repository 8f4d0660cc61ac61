"""End-to-end eval drivers on fabricated on-disk datasets: TAP-Vid tracking
(video dir + benchmark pkl) and OnePose (templates + test sequences)."""
import pytest
import json
import pickle

import jax
import numpy as np
from PIL import Image

from gd3d.core.config import StudentConfig
from gd3d.eval.onepose import load_onepose_object, oneposepp
from gd3d.eval.tracking import tracking, tracking_single
from gd3d.models.student import Student

SMALL = StudentConfig(
    embed_dim=32, depth=2, num_heads=2, patch_size=16,
    pretrain_img_size=32, lora_start_block=99, use_adapters=False,
    target_res=64, depth_head_hidden=16,
)


@pytest.mark.slow
def test_tracking_driver(tmp_path):
    rng = np.random.RandomState(0)
    T, H, W = 3, 96, 128
    vdir = tmp_path / "davis" / "0" / "video"
    vdir.mkdir(parents=True)
    for t in range(T):
        Image.fromarray(
            rng.randint(0, 255, (H, W, 3), np.uint8)
        ).save(vdir / f"{t:05d}.jpg")

    N = 2
    bench = {
        "videos": [
            {
                "video_idx": 0, "h": H, "w": W,
                "query_points": {0: [[30.0, 40.0], [60.0, 50.0]]},
                "target_points": {0: np.full((N, T, 2), 40.0)},
                "occluded": {0: np.zeros((N, T), bool)},
            }
        ]
    }
    pkl = tmp_path / "bench.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(bench, f)

    student = Student(SMALL)
    params = student.init(jax.random.key(0), img_size=32)
    df = tracking(
        student, params, num_videos=1, benchmark_pkl=str(pkl),
        video_root=str(tmp_path / "davis"), refine=False,
    )
    assert "average_jaccard" in df.columns
    assert len(df) == 1
    assert np.isfinite(df["average_pts_within_thresh"].iloc[0])


def test_onepose_driver(tmp_path):
    rng = np.random.RandomState(1)
    root = tmp_path / "lowtexture"
    sfm = tmp_path / "sfm"
    obj = "0700-toy"
    H, W = 64, 80

    # seq-1 templates (anno_loftr + color) and 3D annotations
    (root / obj / "toy-1" / "anno_loftr").mkdir(parents=True)
    (root / obj / "toy-1" / "color").mkdir(parents=True)
    (sfm / obj / "anno").mkdir(parents=True)
    kp3d = rng.rand(20, 3) * 0.1
    np.savez(sfm / obj / "anno" / "anno_3d_average.npz", keypoints3d=kp3d)
    for idx in ("0", "1"):
        kp2d = rng.rand(8, 2) * [W - 8, H - 8] + 4
        anno = {
            "keypoints2d": kp2d.tolist(),
            "assign_matrix": [list(range(8)), list(range(8))],
        }
        with open(root / obj / "toy-1" / "anno_loftr" / f"{idx}.json", "w") as f:
            json.dump(anno, f)
        import cv2

        cv2.imwrite(str(root / obj / "toy-1" / "color" / f"{idx}.png"),
                    rng.randint(0, 255, (H, W, 3), np.uint8))

    # seq-2 test frames
    for sub in ("color", "intrin_ba", "poses_ba"):
        (root / obj / "toy-2" / sub).mkdir(parents=True)
    import cv2

    cv2.imwrite(str(root / obj / "toy-2" / "color" / "0.png"),
                rng.randint(0, 255, (H, W, 3), np.uint8))
    np.savetxt(root / obj / "toy-2" / "intrin_ba" / "0.txt",
               np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]))
    np.savetxt(root / obj / "toy-2" / "poses_ba" / "0.txt", np.eye(4))

    templates, frames = load_onepose_object(str(root), str(sfm), obj,
                                            every_nth=1)
    assert len(templates) == 2 and len(frames) == 1

    student = Student(SMALL)
    params = student.init(jax.random.key(0), img_size=32)
    df = oneposepp(student, params, root=str(root), sfm_dir=str(sfm),
                   refine=False)
    assert set(df.columns) == {"threshold_1", "threshold_3", "threshold_5"}
    assert len(df) == 1
