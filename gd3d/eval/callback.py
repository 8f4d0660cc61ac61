"""In-training evaluation callback.

The reference's EvaluationCallback runs the configured evaluation_methods
list every 10 epochs and writes one CSV family per method under
evaluation_output/.../epoch_N/ (/root/reference/src/evaluate_timm.py:591-730).
This is the gd3d equivalent: each method runs when its dataset exists on
disk, writes its CSVs under <out_dir>/epoch_<N>/, and contributes its means
to the returned summary dict (which the train loop logs).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

from gd3d.models.student import Student


def run_eval_callback(
    student: Student,
    params: dict,
    methods: Sequence[str],
    data_root: str,
    out_dir: str,
    epoch: int,
    refine: bool = True,
    num_videos: int = 30,
    num_pose_objs: Optional[int] = None,
    pck_categories: Optional[Sequence[str]] = None,
) -> Dict[str, float]:
    """Run every configured eval whose data exists. Returns scalar means
    keyed 'eval/<method>/<metric>' for the metrics logger."""
    root = Path(data_root)
    edir = Path(out_dir) / f"epoch_{epoch}"
    summary: Dict[str, float] = {}

    if "semantic_transfer" in methods:
        pascal = root / "PF-dataset-PASCAL"
        if pascal.exists():
            from gd3d.eval.pck import semantic_transfer

            edir.mkdir(parents=True, exist_ok=True)
            # the reference callback evaluates the configured view mode;
            # we run both (same_view + different_view) like its eval CLI
            for same_view, tag in ((True, "same"), (False, "diff")):
                df = semantic_transfer(
                    student, params, str(pascal), same_view=same_view,
                    refine=refine, categories=pck_categories,
                )
                df.to_csv(edir / f"semantic_transfer_{tag}.csv")
                for col in df.columns:
                    summary[f"eval/pck_{tag}/{col}"] = float(
                        df[col].mean())

    if "tracking" in methods:
        pkl = root / "tapvid_davis_data_strided.pkl"
        videos = root / "davis_480"
        if pkl.exists() and videos.exists():
            from gd3d.eval.tracking import tracking

            edir.mkdir(parents=True, exist_ok=True)
            df = tracking(
                student, params, num_videos=num_videos,
                benchmark_pkl=str(pkl), video_root=str(videos),
                refine=refine,
            )
            df.to_csv(edir / "tracking.csv")
            for col in df.columns:
                summary[f"eval/tracking/{col}"] = float(df[col].mean())

    if "pose" in methods:
        lowtex = root / "lowtexture_test_data"
        sfm = root / "sfm_output" / "outputs_softmax_loftr_loftr"
        if lowtex.exists() and sfm.exists():
            from gd3d.eval.onepose import oneposepp

            edir.mkdir(parents=True, exist_ok=True)
            df = oneposepp(
                student, params, root=str(lowtex), sfm_dir=str(sfm),
                num_objs=num_pose_objs, refine=refine,
            )
            df.to_csv(edir / "pose_estimation.csv")
            for col in df.columns:
                summary[f"eval/pose/{col}"] = float(df[col].mean())

    return summary
