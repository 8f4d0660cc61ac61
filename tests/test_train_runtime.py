"""Training-runtime features added in round 2 (VERDICT.md items 4, 5, 8):

- async host pipeline: PrefetchIterator overlaps fetch with the step and
  reports the host-wait fraction
- train resume: kill-and-resume reproduces the uninterrupted metrics stream
- YAML config loading: gd3d/configs/*.yaml parse into DistillConfig
- the 3-method eval callback writes all three CSV families
"""
import json
import pickle
import time

import jax
import numpy as np
import pytest
from PIL import Image

from gd3d.core.config import StudentConfig, resolve_config
from gd3d.data.loader import PrefetchIterator
from gd3d.models.student import Student

SMALL = StudentConfig(
    embed_dim=32, depth=2, num_heads=2, patch_size=16,
    pretrain_img_size=32, lora_start_block=99, use_adapters=False,
    target_res=64, depth_head_hidden=16,
)


# ------------------------------------------------------------ prefetch
def test_prefetch_iterator_overlaps_and_preserves_order():
    def slow_gen():
        for i in range(5):
            time.sleep(0.05)
            yield i

    it = PrefetchIterator(slow_gen(), depth=2)
    time.sleep(0.2)  # let the producer run ahead
    t0 = time.perf_counter()
    out = list(it)
    consumed = time.perf_counter() - t0
    assert out == [0, 1, 2, 3, 4]
    # most of the 0.25 s production happened during the sleep: the consumer
    # only waits for what wasn't prefetched yet
    assert consumed < 0.25
    assert it.wait_time <= consumed + 1e-3


def test_prefetch_iterator_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(bad_gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


# ------------------------------------------------------------ YAML config
def test_yaml_configs_load():
    for name, teacher, dataset in [
        ("finetune_timm_mast3r_scannetpp", "mast3r", "scannetpp"),
        ("finetune_timm_me_objaverse", "me", "objaverse"),
        ("finetune_timm_vggt_objaverse", "vggt", "objaverse"),
    ]:
        cfg = resolve_config(name)  # resolves via gd3d/configs/<name>.yaml
        assert cfg.teacher == teacher and cfg.dataset == dataset
        assert cfg.evaluation_methods == (
            "semantic_transfer", "tracking", "pose")


def test_yaml_config_unknown_combo_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("matcher: nope\ndataset: scannetpp\n")
    with pytest.raises(ValueError, match="no named config"):
        resolve_config(str(p))


# ------------------------------------------------------------ eval callback
def _fabricate_eval_data(root):
    rng = np.random.RandomState(0)
    # --- PF-PASCAL (cat category only)
    import pandas as pd

    pascal = root / "PF-dataset-PASCAL"
    pascal.mkdir(parents=True)
    (root / "JPEGImages").mkdir()
    names = []
    for i in range(2):
        n = f"JPEGImages/im{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (80, 100, 3), np.uint8)).save(
            root / n)
        names.append(n)
    xa = ";".join(f"{v:.1f}" for v in [20, 50, 70])
    ya = ";".join(f"{v:.1f}" for v in [30, 40, 60])
    rows = [[names[0], names[1], 8, xa, ya, xa, ya]]
    df = pd.DataFrame(rows)
    df.to_csv(pascal / "test_pairs_pf_different_views.csv", index=False)
    df.to_csv(pascal / "test_pairs_pf_same_views.csv", index=False)

    # --- TAP-Vid (1 tiny video)
    T, H, W = 2, 64, 96
    vdir = root / "davis_480" / "0" / "video"
    vdir.mkdir(parents=True)
    for t in range(T):
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            vdir / f"{t:05d}.jpg")
    bench = {
        "videos": [{
            "video_idx": 0, "h": H, "w": W,
            "query_points": {0: [[30.0, 40.0]]},
            "target_points": {0: np.full((1, T, 2), 40.0)},
            "occluded": {0: np.zeros((1, T), bool)},
        }]
    }
    with open(root / "tapvid_davis_data_strided.pkl", "wb") as f:
        pickle.dump(bench, f)

    # --- OnePose (1 tiny object)
    import cv2

    lowtex = root / "lowtexture_test_data"
    sfm = root / "sfm_output" / "outputs_softmax_loftr_loftr"
    obj = "0700-toy"
    (lowtex / obj / "toy-1" / "anno_loftr").mkdir(parents=True)
    (lowtex / obj / "toy-1" / "color").mkdir(parents=True)
    (sfm / obj / "anno").mkdir(parents=True)
    np.savez(sfm / obj / "anno" / "anno_3d_average.npz",
             keypoints3d=rng.rand(20, 3) * 0.1)
    Hh, Ww = 64, 80
    for idx in ("0",):
        kp2d = rng.rand(8, 2) * [Ww - 8, Hh - 8] + 4
        anno = {"keypoints2d": kp2d.tolist(),
                "assign_matrix": [list(range(8)), list(range(8))]}
        with open(lowtex / obj / "toy-1" / "anno_loftr" / f"{idx}.json",
                  "w") as f:
            json.dump(anno, f)
        cv2.imwrite(str(lowtex / obj / "toy-1" / "color" / f"{idx}.png"),
                    rng.randint(0, 255, (Hh, Ww, 3), np.uint8))
    for sub in ("color", "intrin_ba", "poses_ba"):
        (lowtex / obj / "toy-2" / sub).mkdir(parents=True)
    cv2.imwrite(str(lowtex / obj / "toy-2" / "color" / "0.png"),
                rng.randint(0, 255, (Hh, Ww, 3), np.uint8))
    np.savetxt(lowtex / obj / "toy-2" / "intrin_ba" / "0.txt",
               np.array([[60.0, 0, Ww / 2], [0, 60.0, Hh / 2], [0, 0, 1]]))
    np.savetxt(lowtex / obj / "toy-2" / "poses_ba" / "0.txt", np.eye(4))


@pytest.mark.slow
def test_eval_callback_writes_all_three_csv_families(tmp_path):
    from gd3d.eval.callback import run_eval_callback
    from gd3d.eval.pck import PASCAL_CATEGORIES

    _fabricate_eval_data(tmp_path)
    student = Student(SMALL)
    params = student.init(jax.random.key(0), img_size=32)
    summary = run_eval_callback(
        student, params,
        methods=("semantic_transfer", "tracking", "pose"),
        data_root=str(tmp_path), out_dir=str(tmp_path / "out"), epoch=10,
        refine=False, num_videos=1,
        pck_categories=[PASCAL_CATEGORIES[7]],  # 'cat' (1-indexed id 8)
    )
    edir = tmp_path / "out" / "epoch_10"
    assert (edir / "semantic_transfer_same.csv").exists()
    assert (edir / "semantic_transfer_diff.csv").exists()
    assert (edir / "tracking.csv").exists()
    assert (edir / "pose_estimation.csv").exists()
    assert any(k.startswith("eval/pck_diff/") for k in summary)
    assert any(k.startswith("eval/tracking/") for k in summary)
    assert any(k.startswith("eval/pose/") for k in summary)


def test_eval_callback_skips_missing_data(tmp_path):
    from gd3d.eval.callback import run_eval_callback

    student = Student(SMALL)
    params = student.init(jax.random.key(0), img_size=32)
    summary = run_eval_callback(
        student, params, methods=("semantic_transfer", "tracking", "pose"),
        data_root=str(tmp_path), out_dir=str(tmp_path / "out"), epoch=10,
    )
    assert summary == {}
    assert not (tmp_path / "out").exists()


# ------------------------------------------------------------ resume
@pytest.mark.slow
def test_train_cli_multistep_rounds_up_with_fresh_batches(tmp_path):
    """K=4 over 5 steps: the scan trainer applies the optimizer on every
    slice, so the epoch rounds UP to 8 REAL steps (fresh wrapped batches)
    instead of padding with a repeated batch (which would run biased
    duplicate updates)."""
    from gd3d.cli.train import main

    out = tmp_path / "k4"
    main(["--config", "finetune_timm_mast3r_objaverse", "--tiny",
          "--synthetic", "--steps-per-epoch", "5", "--multistep", "4",
          "--epochs", "1", "--output", str(out)])
    recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
    steps = [r["step"] for r in recs if "step" in r]
    assert steps == list(range(8)), steps
    assert all(np.isfinite(r["loss"]) for r in recs if "step" in r)


@pytest.mark.slow
def test_train_cli_resume_reproduces_metrics(tmp_path):
    """Run 3 epochs straight vs 2 epochs + resume: the epoch-2 loss stream
    must be identical (synthetic data is seeded per (epoch, step))."""
    from gd3d.cli.train import main

    common = ["--config", "finetune_timm_me_objaverse", "--tiny",
              "--synthetic", "--steps-per-epoch", "2"]

    out_a = tmp_path / "straight"
    main(common + ["--epochs", "3", "--output", str(out_a)])

    out_b = tmp_path / "resumed"
    main(common + ["--epochs", "2", "--output", str(out_b)])
    main(common + ["--epochs", "3", "--output", str(out_b),
                   "--resume", str(out_b / "last")])

    def losses(path):
        recs = [json.loads(l) for l in open(path / "metrics.jsonl")]
        return [(r["epoch"], r["step"], r["loss"])
                for r in recs if "step" in r]

    la, lb = losses(out_a), losses(out_b)
    assert [x[:2] for x in la] == [x[:2] for x in lb]
    for (ea, sa, va), (eb, sb, vb) in zip(la, lb):
        assert abs(va - vb) < 1e-6, (ea, sa, va, vb)
