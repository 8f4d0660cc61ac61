"""Benchmark: distillation-step throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current flagship benchmark: the ME (teacher-free) distillation step on the
full ViT-B/16 student at Objaverse shapes — 2 student forwards at the
effective-stride-8 resolution + smooth-AP loss + adapter-only AdamW update,
matching src/finetune_timm_me.py:191-220. vs_baseline is measured against
BASELINE.json's north-star 2000 pairs/s/chip target.
"""
from __future__ import annotations

import json
import time

import numpy as np

NORTH_STAR_PAIRS_PER_SEC = 2000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gd3d.core.config import DistillConfig, StudentConfig
    from gd3d.data.synthetic import synthetic_me_batch
    from gd3d.distill import build_me_train_step, make_optimizer
    from gd3d.distill.train_state import init_state
    from gd3d.models.student import Student, split_params

    cfg = DistillConfig(
        teacher="me",
        dataset="objaverse",
        student=StudentConfig(lora_start_block=8, use_adapters=False),
    )

    # Objaverse renders are 512x512 (data_utils/blenderproc.py); the student
    # upsamples to 1280^2 internally (stride-8 trick). 3000 kps/view
    # (data_utils/dataset.py:71). Batch = pairs per step on this one chip.
    IMG, KPS, BATCH = 512, 3000, 2
    STEPS, WARMUP = 10, 2

    student = Student(cfg.student, me_interp_quirk=True)
    params = student.init(jax.random.key(0), img_size=64)
    trainable, frozen = split_params(params)
    tx = make_optimizer(cfg.train)
    step_fn = jax.jit(build_me_train_step(student, cfg, tx))
    state = init_state(tx, trainable)

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_me_batch(0, batch=BATCH, img=IMG, n_kps=KPS).items()
    }

    for _ in range(WARMUP):
        state, metrics = step_fn(state, frozen, batch)
    float(metrics["loss"])  # force full sync (block_until_ready alone does
    # not reliably drain the axon-tunneled device queue)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step_fn(state, frozen, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "me_distill_pairs_per_sec",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs_per_sec / NORTH_STAR_PAIRS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
