"""Typed configuration for the whole framework.

The reference scatters its hyper-parameters across module constructors
(/root/reference/src/finetune_timm_mast3r.py:79-164, :683-689,
 /root/reference/src/finetune_timm_me.py:76-82,
 /root/reference/src/finetune_timm_vggt.py:86-188). Here every knob lives in
one frozen dataclass tree so configs are hashable (usable as jit static args)
and serializable to/from YAML.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class StudentConfig:
    """Student backbone + adapter stack.

    Mirrors the timm ViT-B/16 CLIP student with LoRA/Adapter injection
    (/root/reference/src/finetune_timm_mast3r.py:97-164).
    """

    # ViT-B/16 `vit_base_patch16_clip_384.laion2b_ft_in12k_in1k`
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    pretrain_img_size: int = 384  # pos-embed grid 24x24 (+1 cls)
    num_prefix_tokens: int = 1
    # timm's CLIP ViT variants pass pre_norm=True and a PLAIN nn.LayerNorm
    # (eps 1e-5): a norm_pre LayerNorm after the pos-embed add, and a
    # bias-free patch-embed conv (timm vision_transformer.py:
    # `bias=not pre_norm`)
    pre_norm: bool = True
    layernorm_eps: float = 1e-5

    # LoRA rank-4 on q,v of blocks[lora_start_block:]
    # (mast3r/vggt: blocks[4:]; me: last 4 blocks => start 8)
    lora_rank: int = 4
    lora_start_block: int = 4
    # Serial bottleneck adapters on the same blocks (mast3r/vggt only)
    use_adapters: bool = True
    adapter_bottleneck: int = 64

    # Feature-extraction geometry (finetune_timm_mast3r.py:145-151)
    downsample_factor: int = 8
    target_res: int = 640

    # depth-difference head (utils/model.py:88-127)
    depth_head_hidden: int = 128
    depth_head_tanh: bool = True

    # rematerialize block activations in the backward pass (memory-for-FLOPs
    # trade to fit larger pair batches; jax.checkpoint on the scan bodies)
    remat: bool = False

    # matmul/conv compute dtype ("float32" | "bfloat16"). bf16 runs the MXU
    # at 2x; params stay fp32 masters, LayerNorms and the residual stream
    # stay fp32, losses are always fp32 — the TPU analogue of the reference's
    # AMP autocast (src/finetune_timm_mast3r.py:758).
    compute_dtype: str = "float32"

    # carry the transformer residual stream in bf16 too (torch autocast
    # keeps residual adds in half precision while layer_norm computes fp32
    # — this matches the reference's AMP semantics even more closely than
    # the fp32 stream, and halves the stream's HBM traffic). Only takes
    # effect when compute_dtype="bfloat16".
    bf16_stream: bool = False

    @property
    def dtype(self):
        import jax.numpy as jnp

        if self.compute_dtype == "bfloat16":
            return jnp.bfloat16
        if self.compute_dtype == "float32":
            return jnp.float32
        raise ValueError(
            f"compute_dtype must be 'float32' or 'bfloat16', got "
            f"{self.compute_dtype!r}"
        )

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def pos_grid(self) -> int:
        return self.pretrain_img_size // self.patch_size


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Total loss = sum of weighted terms (finetune_timm_mast3r.py:650-653)."""

    ap: float = 1.0
    depth: float = 0.0
    intra_depth: float = 1.0
    kl: float = 1.0


@dataclasses.dataclass(frozen=True)
class KeypointConfig:
    """Keypoint pipeline constants.

    subsample/border/conf follow filter_and_match_keypoints
    (finetune_timm_mast3r.py:414-459); NMS follows sample_keypoints
    (finetune_timm_vggt.py:413-447).
    """

    capacity: int = 512          # fixed kp buffer size (padded, masked)
    nn_subsample: int = 16       # fast_reciprocal_NNs subsample grid
    nn_max_iters: int = 10       # reciprocal fixed-point iterations
    border: int = 3              # border filter in px
    min_conf_percentile: float = 10.0  # bottom-percentile conf threshold
    thres3d_neg: float = 0.1     # AP-loss negative distance threshold
    thresh3d_pos: float = 5e-3   # ME positive distance threshold
    nms_num: int = 300           # VGGT kp count
    nms_min_distance: int = 5
    depth_window: int = 3        # extract_kp_depth window
    depth_rank_threshold: float = 0.05
    ap_sigmoid_temp: float = 0.01


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer + runtime (finetune_timm_mast3r.py:683-689, src/main.py:147-159)."""

    lr: float = 1e-5
    weight_decay: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    grad_clip: float = 1.0
    max_epochs: int = 500
    batch_per_device: int = 1
    grad_accum: int = 1
    seed: int = 42
    # MASt3R attention-temperature schedule (finetune_timm_mast3r.py:162-164)
    init_temperature: float = 1.0
    final_temperature: float = 0.5
    ckpt_every_epochs: int = 1
    eval_every_epochs: int = 10


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for SPMD. data = DP over pairs; model = TP for big teachers."""

    data: int = -1   # -1: all remaining devices
    model: int = 1
    # ring-attention sequence parallelism on the VGGT aggregator's S*P
    # global-attention axis (the long-context story for S > 2 frames);
    # shards the token axis over the `data` mesh axis
    sequence_parallel: bool = False
    # FSDP/ZeRO-3-style sharding of the FROZEN teacher params over the
    # data axis (gd3d/parallel/fsdp.py): per-layer all-gathers instead of
    # a replicated 2 GB VGGT-1B resident per chip
    fsdp_teacher: bool = False

    def shape(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        return (data, model)


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation harness constants (src/evaluate_timm.py)."""

    pck_img_size: int = 640
    pck_alphas: Tuple[float, ...] = (0.10, 0.05, 0.15)
    tracking_size: Tuple[int, int] = (476, 854)
    tracking_stride: int = 8
    tracking_num_videos: int = 30
    anchor_cos_threshold: float = 0.7
    cos_threshold: float = 0.6
    argmax_radius: int = 35
    pose_reproj_px: float = 8.0
    pose_ransac_iters: int = 10000
    pose_grid_stride: int = 4
    pose_template_cap: int = 120_000
    seed: int = 42


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Top-level experiment config — the rebuild's analogue of config/*.yaml."""

    teacher: str = "mast3r"        # mast3r | vggt | me | vanilla
    dataset: str = "scannetpp"     # scannetpp | objaverse | synthetic
    # in-training eval methods run every eval_every_epochs, matching the
    # reference's EvaluationCallback list (config/*.yaml ->
    # src/main.py:95-98 -> src/evaluate_timm.py:591-730)
    evaluation_methods: Tuple[str, ...] = (
        "semantic_transfer", "tracking", "pose",
    )
    student: StudentConfig = dataclasses.field(default_factory=StudentConfig)
    loss_weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    keypoints: KeypointConfig = dataclasses.field(default_factory=KeypointConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    # numeric policy: teacher trunk dtype ("float32" | "bfloat16").
    # Reference parity: MASt3R runs fp32, VGGT's aggregator runs bf16
    # autocast (finetune_timm_vggt.py:359); losses/eval always fp32.
    # The student-side policy lives on StudentConfig.compute_dtype.
    teacher_dtype: str = "float32"

    @property
    def student_dtype(self) -> str:
        return self.student.compute_dtype

    def replace(self, **kw) -> "DistillConfig":
        return dataclasses.replace(self, **kw)


def me_objaverse() -> DistillConfig:
    """finetune_timm_me_objaverse: LoRA on last 4 blocks, no adapters."""
    return DistillConfig(
        teacher="me",
        dataset="objaverse",
        student=StudentConfig(lora_start_block=8, use_adapters=False),
        loss_weights=LossWeights(ap=1.0, depth=0.0, intra_depth=0.0, kl=0.0),
    )


def mast3r_scannetpp() -> DistillConfig:
    return DistillConfig(teacher="mast3r", dataset="scannetpp")


def mast3r_objaverse() -> DistillConfig:
    return DistillConfig(teacher="mast3r", dataset="objaverse")


def vggt_scannetpp() -> DistillConfig:
    return DistillConfig(
        teacher="vggt",
        dataset="scannetpp",
        loss_weights=LossWeights(ap=1.0, depth=1.0, intra_depth=1.0, kl=1.0),
        teacher_dtype="bfloat16",
    )


def vggt_objaverse() -> DistillConfig:
    return vggt_scannetpp().replace(dataset="objaverse")


NAMED_CONFIGS = {
    "finetune_timm_me_objaverse": me_objaverse,
    "finetune_timm_mast3r_scannetpp": mast3r_scannetpp,
    "finetune_timm_mast3r_objaverse": mast3r_objaverse,
    "finetune_timm_vggt_scannetpp": vggt_scannetpp,
    "finetune_timm_vggt_objaverse": vggt_objaverse,
}


def load_yaml_config(path: str) -> DistillConfig:
    """Parse one of gd3d/configs/*.yaml (the Hydra-analogue files mirroring
    /root/reference/config/*.yaml) into a DistillConfig.

    The YAML selects {matcher, dataset, evaluation_methods}; the matching
    NAMED_CONFIGS factory supplies every other hyper-parameter, then the
    YAML's evaluation_methods list overrides the default.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    matcher = raw.get("matcher", "mast3r")
    dataset = raw.get("dataset", "scannetpp")
    name = f"finetune_timm_{matcher}_{dataset}"
    if name not in NAMED_CONFIGS:
        raise ValueError(
            f"{path}: no named config for matcher={matcher!r} "
            f"dataset={dataset!r} (expected one of {sorted(NAMED_CONFIGS)})"
        )
    cfg = NAMED_CONFIGS[name]()
    methods = raw.get("evaluation_methods")
    if methods is not None:
        cfg = cfg.replace(evaluation_methods=tuple(methods))
    return cfg


def resolve_config(name_or_path: str) -> DistillConfig:
    """NAMED_CONFIGS key, bare config name (gd3d/configs/<name>.yaml), or an
    explicit .yaml path."""
    import os

    if name_or_path.endswith((".yaml", ".yml")):
        return load_yaml_config(name_or_path)
    bundled = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", f"{name_or_path}.yaml",
    )
    if os.path.exists(bundled):
        return load_yaml_config(bundled)
    return NAMED_CONFIGS[name_or_path]()
