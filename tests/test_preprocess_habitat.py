"""gd3d-preprocess --dataset habitat (gd3d/data/preprocess_habitat.py).

Parity target: dust3r/croco/datasets/habitat_sim/ — the generated tree
must match the reference layout exactly (generate_multiview_images.py:
86-96: `<key>_<i>.jpeg` + depth + camera_params.json, i = 1..5, plus the
`Habitat_<size>_scenes_<split>.txt` list) and load through the real
HabitatViews pipeline end-to-end.
"""
import json
import os.path as osp

import numpy as np
import pytest

from gd3d.cli.preprocess import main


def test_habitat_generator_tree_loads(tmp_path):
    out = tmp_path / "habitat"
    main(["--dataset", "habitat", "--output-dir", str(out),
          "--num-sequences-per-object", "2", "--img-size", "64",
          "--seed", "7"])

    train_list = out / "Habitat_64_scenes_train.txt"
    assert train_list.exists() and (out / "Habitat_64_scenes_val.txt").exists()
    scenes = train_list.read_text().splitlines()
    assert len(scenes) == 2
    data_dir, key = osp.split(osp.join(str(out), scenes[0]))
    for i in range(1, 6):
        assert osp.exists(osp.join(data_dir, f"{key}_{i}.jpeg"))
        assert osp.exists(osp.join(data_dir, f"{key}_{i}_depth.exr.npy"))
        with open(osp.join(data_dir,
                           f"{key}_{i}_camera_params.json")) as f:
            cam = json.load(f)
        assert set(cam) == {"camera_intrinsics", "R_cam2world",
                            "t_cam2world"}
        R = np.asarray(cam["R_cam2world"])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
        depth = np.load(osp.join(data_dir, f"{key}_{i}_depth.exr.npy"))
        assert depth.shape == (64, 64) and depth.dtype == np.float32
        assert (depth > 0).mean() > 0.25  # the scene covers the frame

    from gd3d.data.stereo_views import HabitatViews

    ds = HabitatViews(str(out), 64, split="train", resolution=(48, 32),
                      seed=3)
    v1, v2 = ds[0]
    assert v1["dataset"] == "Habitat"
    assert v1["img"].shape == (32, 48, 3)
    assert np.isfinite(v1["camera_pose"]).all()
    assert v1["valid_mask"].any() and v2["valid_mask"].any()
    # the 5 views share one scene: poses differ but look at the same spot
    assert not np.allclose(v1["camera_pose"], v2["camera_pose"])


def test_habitat_sim_flag_errors_with_recipe(tmp_path):
    with pytest.raises(SystemExit) as ei:
        main(["--dataset", "habitat", "--habitat-sim",
              "--output-dir", str(tmp_path / "o")])
    assert "habitat-sim" in str(ei.value)
    assert "gd3d-preprocess --dataset habitat --habitat-sim" in str(ei.value)
