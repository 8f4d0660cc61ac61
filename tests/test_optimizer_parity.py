"""Optimizer-trajectory parity: optax chain vs the reference torch recipe.

Round-3 verdict item 2. The reference trains with
torch.optim.AdamW(lr=1e-5, weight_decay=1e-4) over the adapter params
(src/finetune_timm_mast3r.py:683-689) under Lightning's
gradient_clip_val=1.0, which applies torch.nn.utils.clip_grad_norm_ over
all trainable params globally before every step (src/main.py:147-159).
gd3d's make_optimizer (gd3d/distill/train_state.py:28-42) composes
optax.clip_by_global_norm(1.0) + optax.adamw. A clip-vs-decay ordering or
eps-placement difference would accumulate silently over steps; these tests
run N steps of BOTH on shared weights and identical per-step losses and
assert the trajectories track at fp64 tightness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from gd3d.core.config import TrainConfig
from gd3d.distill.train_state import make_optimizer

N_STEPS = 5
SHAPES = {"a": (4, 6), "b": (3,), "c": (5, 2)}


def _problem(scale):
    """Deterministic per-step quadratic losses: loss_t(p) = sum_i
    ||p_i * a_i[t] - b_i[t]||^2. `scale` controls the gradient magnitude so
    the global-norm clip engages (scale large) or not (scale tiny)."""
    rng = np.random.RandomState(0)
    init = {k: rng.randn(*s).astype(np.float64) for k, s in SHAPES.items()}
    coefs = [
        {k: (scale * rng.randn(*s)).astype(np.float64)
         for k, s in SHAPES.items()}
        for _ in range(N_STEPS)
    ]
    targets = [
        {k: rng.randn(*s).astype(np.float64) for k, s in SHAPES.items()}
        for _ in range(N_STEPS)
    ]
    return init, coefs, targets


def _torch_trajectory(cfg: TrainConfig, init, coefs, targets):
    params = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
              for k, v in init.items()}
    opt = torch.optim.AdamW(
        list(params.values()), lr=cfg.lr, betas=(cfg.adam_b1, cfg.adam_b2),
        eps=cfg.adam_eps, weight_decay=cfg.weight_decay)
    clipped = 0
    for a, b in zip(coefs, targets):
        opt.zero_grad()
        loss = sum(
            ((params[k] * torch.from_numpy(a[k]) - torch.from_numpy(b[k]))
             ** 2).sum()
            for k in params)
        loss.backward()
        total = torch.nn.utils.clip_grad_norm_(
            list(params.values()), cfg.grad_clip)
        clipped += int(float(total) > cfg.grad_clip)
        opt.step()
    return {k: v.detach().numpy() for k, v in params.items()}, clipped


def _optax_trajectory(cfg: TrainConfig, init, coefs, targets):
    tx = make_optimizer(cfg)
    params = {k: jnp.asarray(v) for k, v in init.items()}
    opt_state = tx.init(params)

    def loss_fn(p, a, b):
        return sum(jnp.sum((p[k] * a[k] - b[k]) ** 2) for k in p)

    import optax

    for a, b in zip(coefs, targets):
        a = {k: jnp.asarray(v) for k, v in a.items()}
        b = {k: jnp.asarray(v) for k, v in b.items()}
        grads = jax.grad(loss_fn)(params, a, b)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    return {k: np.asarray(v) for k, v in params.items()}


def test_adamw_trajectory_matches_torch_with_clipping():
    """Gradients exceed the clip norm every step: clip scaling, decoupled
    decay, bias correction and eps placement must all line up."""
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = TrainConfig()
        init, coefs, targets = _problem(scale=10.0)
        want, clipped = _torch_trajectory(cfg, init, coefs, targets)
        assert clipped == N_STEPS, "test setup: clip should engage each step"
        got = _optax_trajectory(cfg, init, coefs, targets)
        for k in SHAPES:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-12,
                                       atol=1e-12, err_msg=k)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_adamw_trajectory_matches_torch_unclipped():
    """Tiny gradients (clip never engages): pure AdamW semantics."""
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = TrainConfig()
        init, coefs, targets = _problem(scale=1e-3)
        want, clipped = _torch_trajectory(cfg, init, coefs, targets)
        assert clipped == 0
        got = _optax_trajectory(cfg, init, coefs, targets)
        for k in SHAPES:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-12,
                                       atol=1e-12, err_msg=k)
    finally:
        jax.config.update("jax_enable_x64", False)
