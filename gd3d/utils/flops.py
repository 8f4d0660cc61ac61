"""Analytic matmul/conv FLOP counter over a traced jaxpr.

XLA's compiled cost_analysis counts scan bodies ONCE, so any scan-over-layers
model (all gd3d trunks) and the multistep trainer are undercounted by the
trip counts. This walks the jaxpr instead: dot_general and
conv_general_dilated contribute 2 * MACs, scan bodies multiply by length,
while_loop bodies by an assumed trip count (1 by default — gd3d's only
while_loop is the early-exit reciprocal NN, whose matmul cost is small).

Elementwise/reduction FLOPs are ignored: on TPU the matmul/conv FLOPs are
what the MXU peak is quoted for, so MFU = counted_flops / time / peak.
"""
from __future__ import annotations

import math

import jax


def _dot_general_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb)
    contract = math.prod(lhs.shape[d] for d in lc)
    m = math.prod(
        s for d, s in enumerate(lhs.shape) if d not in set(lb) | set(lc))
    n = math.prod(
        s for d, s in enumerate(rhs.shape) if d not in set(rb) | set(rc))
    return 2.0 * batch * m * n * contract


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval  # kernel
    dn = eqn.params["dimension_numbers"]
    out_batch_spatial = math.prod(
        out.shape[d] for d in (dn.out_spec[0], *dn.out_spec[2:]))
    out_ch = out.shape[dn.out_spec[1]]
    kernel_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    in_ch_per_group = rhs.shape[dn.rhs_spec[1]]
    return 2.0 * out_batch_spatial * out_ch * kernel_spatial * in_ch_per_group


def count_jaxpr_flops(jaxpr, while_trips: int = 1) -> float:
    """Sum matmul/conv FLOPs over a (Closed)Jaxpr, recursing into control
    flow with the right multipliers."""
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * count_jaxpr_flops(
                eqn.params["jaxpr"], while_trips)
        elif name == "while":
            total += while_trips * count_jaxpr_flops(
                eqn.params["body_jaxpr"], while_trips)
            total += count_jaxpr_flops(eqn.params["cond_jaxpr"], while_trips)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(
                count_jaxpr_flops(b, while_trips) for b in branches)
        elif name == "pallas_call":
            # kernel body runs once per grid cell (e.g. the flash-attention
            # q/k block loops) — without the multiplier the student/teacher
            # attention FLOPs vanish from the count
            grid = getattr(eqn.params.get("grid_mapping"), "grid", ())
            mult = math.prod(int(g) for g in grid if isinstance(g, int))
            total += max(mult, 1) * count_jaxpr_flops(
                eqn.params["jaxpr"], while_trips)
        else:
            # "call" = custom_partitioning's inner ClosedJaxpr (the
            # multichip pallas wrappers) — without it the attention
            # fwd/bwd FLOPs vanish from the count
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr", "call"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += count_jaxpr_flops(sub, while_trips)
                    break
    return total


def count_fn_flops(fn, *args, while_trips: int = 1, **kwargs) -> float:
    """Trace fn(*args, **kwargs) and count its matmul/conv FLOPs."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return count_jaxpr_flops(jaxpr, while_trips)


V5E_BF16_PEAK_FLOPS = 197e12
V5E_FP32_PEAK_FLOPS = 49e12


def mfu(flops: float, seconds: float,
        peak: float = V5E_BF16_PEAK_FLOPS) -> float:
    return flops / max(seconds, 1e-12) / peak
