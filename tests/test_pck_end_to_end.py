"""semantic_transfer end-to-end on a fabricated PF-PASCAL directory."""
import numpy as np
import pandas as pd
import pytest
from PIL import Image

import jax

from gd3d.core.config import StudentConfig
from gd3d.eval.pck import semantic_transfer
from gd3d.models.student import Student

SMALL = StudentConfig(
    embed_dim=32, depth=2, num_heads=2, patch_size=16,
    pretrain_img_size=32, lora_start_block=99, use_adapters=False,
    target_res=64, depth_head_hidden=16,
)


def _fixture(tmp_path):
    root = tmp_path / "PF-dataset-PASCAL"
    root.mkdir()
    imgdir = tmp_path / "JPEGImages"
    imgdir.mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(4):
        n = f"JPEGImages/im{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (80, 100, 3), np.uint8)
        ).save(tmp_path / n)
        names.append(n)

    def coords(xs, ys):
        return ";".join(f"{v:.1f}" for v in xs), ";".join(f"{v:.1f}" for v in ys)

    rows = []
    for cls_id in (8, 8):  # 'cat' twice (1-indexed 8 => index 7... see below)
        xa, ya = coords([20, 50, 70], [30, 40, 60])
        xb, yb = coords([25, 55, 65], [35, 45, 55])
        rows.append([names[0], names[1], cls_id, xa, ya, xb, yb])
    df = pd.DataFrame(rows)
    df.to_csv(root / "test_pairs_pf_different_views.csv", index=False)
    df.to_csv(root / "test_pairs_pf_same_views.csv", index=False)
    return str(root)


@pytest.mark.parametrize("same_view", [False])
def test_semantic_transfer_end_to_end(tmp_path, same_view):
    path = _fixture(tmp_path)
    student = Student(SMALL)
    params = student.init(jax.random.key(0), img_size=32)
    from gd3d.eval.pck import PASCAL_CATEGORIES

    cat = PASCAL_CATEGORIES[8 - 1]  # cls ids are 1-indexed in the CSV
    df = semantic_transfer(
        student, params, path, categories=[cat], same_view=same_view,
        img_size=64,
    )
    assert set(["PCK0.05", "PCK0.10", "PCK0.15"]).issubset(df.columns)
    assert len(df) == 1
    for col in ("PCK0.05", "PCK0.10", "PCK0.15"):
        v = float(df[col].iloc[0])
        assert 0.0 <= v <= 1.0
