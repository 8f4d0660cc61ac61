import numpy as np
import pytest

from gd3d.utils.misc import parse_yaml, resize_crop, rotation_angle_from_matrix


def test_rotation_angle():
    assert rotation_angle_from_matrix(np.eye(3)) == pytest.approx(0.0)
    th = 0.5
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    assert rotation_angle_from_matrix(R) == pytest.approx(th, abs=1e-6)


def test_parse_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nb:\n  - x\n  - y\n")
    d = parse_yaml(str(p))
    assert d == {"a": 1, "b": ["x", "y"]}


def test_resize_crop():
    img = np.zeros((64, 64, 3), np.uint8)
    img[20:40, 10:50] = 255
    out, T = resize_crop(img, out_size=32)
    assert out.shape == (32, 32, 3)
    assert T.shape == (3, 3)
    # transform maps output center to bbox center
    c = T @ np.array([16, 16, 1.0])
    assert abs(c[0] - 30) < 2 and abs(c[1] - 30) < 2


def test_grain_loader():
    pytest.importorskip("grain")
    from gd3d.data.grain_pipeline import make_grain_loader

    data = [
        {"x": np.full((3,), i, np.float32), "name": f"s{i}"} for i in range(10)
    ]
    it = make_grain_loader(data, batch_size=2, seed=0, epochs=1)
    batches = list(it)
    assert len(batches) == 5
    assert batches[0]["x"].shape == (2, 3)
    assert "name" not in batches[0]


def test_grain_loader_process_sharding():
    """Multi-host sharding: explicit shard_index/count yields disjoint,
    jointly-complete coverage (the per-rank DataLoader analogue)."""
    pytest.importorskip("grain")
    from gd3d.data.grain_pipeline import make_grain_loader

    data = [
        {"x": np.full((1,), i, np.float32)} for i in range(12)
    ]
    seen = []
    for rank in range(3):
        it = make_grain_loader(data, batch_size=1, seed=0, epochs=1,
                               shard_index=rank, shard_count=3)
        seen.append({int(b["x"][0, 0]) for b in it})
    assert all(len(s) == 4 for s in seen)
    assert seen[0] | seen[1] | seen[2] == set(range(12))
    assert not (seen[0] & seen[1] or seen[0] & seen[2] or seen[1] & seen[2])
