"""Evaluation CLI — the analogue of `python src/evaluate_timm.py`.

Usage:
  python -m gd3d.cli.evaluate --ckpt outputs/.../ckpt_epoch_0010 \
      [--matcher mast3r|vggt|me|vanilla] [--transfer] [--tracking] [--pose] \
      [--same-view] [--data-root data] [--out evaluation_output]

Parity target: src/evaluate_timm.py:733-775 — vanilla mode runs the
un-finetuned student under the identical harness (VanillaTIMM,
src/vanilla_timm.py).
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None, help="orbax adapter checkpoint dir")
    p.add_argument("--adapter-ckpt", default=None,
                   help="reference Lightning .ckpt with w_a_*/adapter_* keys")
    p.add_argument("--matcher", default="mast3r",
                   choices=["mast3r", "vggt", "me", "vanilla"])
    p.add_argument("--student-ckpt", default=None)
    p.add_argument("--transfer", action="store_true")
    p.add_argument("--tracking", action="store_true")
    p.add_argument("--pose", action="store_true")
    p.add_argument("--same-view", action="store_true")
    p.add_argument("--num-cats", type=int, default=None)
    p.add_argument("--num-videos", type=int, default=30)
    p.add_argument("--data-root", default="data")
    p.add_argument("--dataset", default="scannetpp",
                   help="run-dir tag only (evaluation_output layout parity)")
    p.add_argument("--out", default="evaluation_output")
    args = p.parse_args(argv)

    import jax

    from gd3d.core.checkpoint import restore_checkpoint
    from gd3d.core.config import StudentConfig
    from gd3d.models.student import Student, merge_params, split_params
    from gd3d.teachers.convert import convert_timm_vit, graft_pretrained_vit

    if args.matcher == "me":
        cfg = StudentConfig(lora_start_block=8, use_adapters=False)
    elif args.matcher == "vanilla":
        cfg = StudentConfig(lora_start_block=12, use_adapters=False)
    else:
        cfg = StudentConfig()

    student = Student(cfg)
    params = student.init(jax.random.key(42), img_size=64)
    if args.student_ckpt:
        from gd3d.cli.train import load_torch_state

        params["vit"] = graft_pretrained_vit(
            params["vit"], convert_timm_vit(load_torch_state(args.student_ckpt), cfg)
        )
    if args.ckpt:
        trainable, frozen = split_params(params)
        trainable = restore_checkpoint(args.ckpt, jax.device_get(trainable))
        params = merge_params(trainable, frozen)
    elif args.adapter_ckpt:
        from gd3d.core.checkpoint import (
            import_reference_layout,
            load_reference_checkpoint,
        )

        trainable, frozen = split_params(params)
        flat = load_reference_checkpoint(args.adapter_ckpt)
        trainable = import_reference_layout(
            jax.device_get(trainable), flat, cfg
        )
        params = merge_params(trainable, frozen)

    # vanilla has no refine_conv in the reference harness
    refine = args.matcher != "vanilla"

    # evaluation_output/{model}/{matcher}/{backbone}/{dataset}/{ts}
    # (src/evaluate_timm.py:600-602)
    out_dir = (
        Path(args.out) / "timm" / args.matcher / "ViT-B-16" / args.dataset
        / time.strftime("%Y%m%d_%H%M%S")
    )
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.pose:
        from gd3d.eval.onepose import oneposepp

        df = oneposepp(
            student, params,
            root=f"{args.data_root}/lowtexture_test_data",
            sfm_dir=f"{args.data_root}/sfm_output/outputs_softmax_loftr_loftr",
            refine=refine,
        )
        df.to_csv(out_dir / "pose_estimation.csv")
        print(df.mean())

    if args.tracking:
        from gd3d.eval.tracking import tracking

        df = tracking(
            student, params, num_videos=args.num_videos,
            benchmark_pkl=f"{args.data_root}/tapvid_davis_data_strided.pkl",
            video_root=f"{args.data_root}/davis_480", refine=refine,
        )
        df.to_csv(out_dir / "tracking.csv")
        print(df.mean())

    if args.transfer:
        from gd3d.eval.pck import PASCAL_CATEGORIES, semantic_transfer

        np.random.seed(42)
        cats = (
            None if args.num_cats is None
            else PASCAL_CATEGORIES[: args.num_cats]
        )
        df = semantic_transfer(
            student, params, f"{args.data_root}/PF-dataset-PASCAL",
            same_view=args.same_view, refine=refine, categories=cats,
        )
        df.to_csv(out_dir / "semantic_transfer.csv")
        print(df.mean())

    print(f"results saved under {out_dir}")


if __name__ == "__main__":
    main()
