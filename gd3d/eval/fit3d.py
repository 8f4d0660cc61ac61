"""FiT3D baseline comparison harness.

Parity target: src/evaluate_timm_fit3d.py — evaluates a FiT3D-finetuned CLIP
ViT-B/16 checkpoint (upstream: HF `yuanwenyue/FiT3D`, fit3d.pth) and the
vanilla backbone side-by-side under the SAME three evaluations (PCK,
TAP-Vid tracking, OnePose pose). The reference downloads the checkpoint
from HF at runtime (`torch.hub.load_state_dict_from_url`, :634,:673); this
rebuild accepts either a local .pth path or an http(s):// URL (same
torch.hub cached-download path) and converts it with the standard
timm->flax converter. Neither model has
refine_conv / adapters — the harness runs with refine=False.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import pandas as pd

from gd3d.core.config import StudentConfig
from gd3d.models.student import Student
from gd3d.teachers.convert import convert_timm_vit, graft_pretrained_vit

VANILLA_CFG = StudentConfig(lora_start_block=12, use_adapters=False)

# the reference's default --ckpt (evaluate_timm_fit3d.py:634)
FIT3D_CKPT_URL = (
    "https://huggingface.co/yuanwenyue/FiT3D/resolve/main/"
    "clip_base_finetuned.pth")


def load_fit3d_state(ckpt: str) -> dict:
    """Load a FiT3D torch state_dict from a local path or an http(s) URL.

    URL loads go through `torch.hub.load_state_dict_from_url` — the
    reference's exact download path (evaluate_timm_fit3d.py:673), which
    caches under $TORCH_HOME/hub/checkpoints."""
    if ckpt.startswith(("http://", "https://")):
        import torch

        state = torch.hub.load_state_dict_from_url(ckpt, map_location="cpu")
        if isinstance(state, dict) and "model" in state:
            state = state["model"]
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        return {k: v.numpy() for k, v in state.items()
                if hasattr(v, "numpy")}
    from gd3d.cli.train import load_torch_state

    return load_torch_state(ckpt)


def load_fit3d_student(ckpt_path: Optional[str], seed: int = 42,
                       cfg: StudentConfig = VANILLA_CFG):
    """Build the (vanilla-architecture) student and optionally load FiT3D
    finetuned weights from a local torch state_dict or an http(s) URL."""
    student = Student(cfg)
    params = student.init(jax.random.key(seed), img_size=64)
    if ckpt_path:
        state = load_fit3d_state(ckpt_path)
        params["vit"] = graft_pretrained_vit(
            params["vit"], convert_timm_vit(state, cfg)
        )
    return student, params


def compare(
    fit3d_ckpt: str,
    vanilla_ckpt: Optional[str],
    data_root: str = "data",
    run_transfer: bool = True,
    run_tracking: bool = False,
    run_pose: bool = False,
    num_videos: int = 30,
    cfg: StudentConfig = VANILLA_CFG,
    transfer_kwargs: Optional[Dict] = None,
) -> Dict[str, pd.DataFrame]:
    """Side-by-side metric tables keyed '{eval}/{model}' — the reference
    harness's layout (evaluate_timm_fit3d.py:628-691 runs each selected
    evaluation for the FiT3D-finetuned model and the vanilla backbone and
    writes one CSV per (eval, model) pair).

    cfg/transfer_kwargs exist so tests can run the full harness at tiny
    geometry; defaults match the reference's full-size ViT-B/16 + 640-canvas
    evaluation."""
    results: Dict[str, pd.DataFrame] = {}
    if vanilla_ckpt is None:
        # the reference baseline is the PRETRAINED backbone
        # (evaluate_timm_fit3d); random weights would masquerade as it
        print("WARNING: no --vanilla-ckpt; the 'vanilla' column uses "
              "RANDOM weights and is not the reference baseline")
    models = {
        "fit3d": load_fit3d_student(fit3d_ckpt, cfg=cfg),
        "vanilla": load_fit3d_student(vanilla_ckpt, cfg=cfg),
    }
    for name, (student, params) in models.items():
        if run_transfer:
            from gd3d.eval.pck import semantic_transfer

            results[f"transfer/{name}"] = semantic_transfer(
                student, params, f"{data_root}/PF-dataset-PASCAL",
                refine=False, **(transfer_kwargs or {}),
            )
        if run_tracking:
            from gd3d.eval.tracking import tracking

            results[f"tracking/{name}"] = tracking(
                student, params, num_videos=num_videos,
                benchmark_pkl=f"{data_root}/tapvid_davis_data_strided.pkl",
                video_root=f"{data_root}/davis_480", refine=False,
            )
        if run_pose:
            from gd3d.eval.onepose import oneposepp

            results[f"pose/{name}"] = oneposepp(
                student, params,
                root=f"{data_root}/lowtexture_test_data",
                sfm_dir=f"{data_root}/sfm_output/outputs_softmax_loftr_loftr",
                refine=False,
            )
    return results


def main(argv=None):
    """CLI: python -m gd3d.eval.fit3d --fit3d-ckpt fit3d.pth [--vanilla-ckpt
    timm.pth] [--transfer] [--tracking] [--pose]"""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument(
        "--fit3d-ckpt", default=FIT3D_CKPT_URL,
        help="local .pth or http(s) URL (default: the upstream HF ckpt, "
             "matching the reference's --ckpt default)")
    p.add_argument("--vanilla-ckpt", default=None)
    p.add_argument("--data-root", default="data")
    p.add_argument("--transfer", action="store_true")
    p.add_argument("--tracking", action="store_true")
    p.add_argument("--pose", action="store_true")
    args = p.parse_args(argv)
    results = compare(
        args.fit3d_ckpt, args.vanilla_ckpt, args.data_root,
        run_transfer=args.transfer, run_tracking=args.tracking,
        run_pose=args.pose,
    )
    for name, df in results.items():
        print(f"===== {name}")
        print(df.mean())


if __name__ == "__main__":
    main()
