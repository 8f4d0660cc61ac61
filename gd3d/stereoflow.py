"""CroCo-Stereo / CroCo-Flow runtime: losses, metrics, tiled inference, train.

Parity targets:
  - dust3r/croco/stereoflow/criterion.py (L1Loss :21, LaplacianLoss :41,
    LaplacianLossBounded :56, LaplacianLossBounded2 :71, StereoMetrics :88,
    FlowMetrics :113, StereoDatasetMetrics :140, FlowDatasetMetrics :184)
  - dust3r/croco/stereoflow/engine.py (tiled_pred :179, _overlapping :267,
    split_prediction_conf :18, the conf_expsigmoid/conf_expbeta tile weights
    :239-242, the bicubic up-scale path :194-204)
  - training defaults: stereoflow/train.py:50-75 (criterion strings,
    crop 352x704 stereo / 320x384 flow, AdamW betas (0.9, 0.95) wd 0.05,
    lr 3e-5 stereo / 2e-5 flow, warmup+cosine)

Conventions: NHWC arrays; gt uses +inf at invalid pixels exactly like the
reference loaders (datasets_stereo.py:551-556); losses/metrics mask on
isfinite(gt). All loss/metric functions are jit-safe (static shapes, masked
means via the double-where trick so no inf/nan reaches a gradient).

TPU-first redesign of tiled_pred: the reference loops tiles through the
model one by one (engine.py:230-248); here ALL tiles are gathered into one
batched forward (the tile grid is static given (H, W, crop, overlap)), and
the weighted accumulation is a set of static-slice scatter-adds — the whole
function jits as one program.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# losses (criterion.py) — gt/pred (B, H, W, C), conf (B, H, W)
# ---------------------------------------------------------------------------


def _gtnorm(gt: jnp.ndarray) -> jnp.ndarray:
    """criterion.py:12-16: stereo -> |gt| channel itself, flow -> L2 norm.
    Returns (B, H, W, 1)."""
    if gt.shape[-1] == 1:
        return gt
    return jnp.sqrt(jnp.sum(jnp.square(gt), axis=-1, keepdims=True))


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(mask)
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(n, 1)


def l1_loss(pred, gt, max_gtnorm: Optional[float] = None):
    """criterion.py:21-37 (elementwise mask over every channel)."""
    mask = jnp.isfinite(gt)
    if max_gtnorm is not None:
        mask = mask & (_gtnorm(gt) < max_gtnorm)
    safe_gt = jnp.where(mask, gt, 0.0)
    return _masked_mean(jnp.abs(safe_gt - pred), mask)


def _conf_pixel_loss(pred, gt, elem_fn, max_gtnorm):
    """Shared skeleton of the Laplacian losses: pixel mask from channel 0,
    per-pixel L1 summed over channels, elem_fn adds the confidence terms."""
    mask = jnp.isfinite(gt)
    pix_mask = mask[..., 0]
    if max_gtnorm is not None:
        pix_mask = pix_mask & (_gtnorm(gt)[..., 0] < max_gtnorm)
    safe_gt = jnp.where(mask, gt, 0.0)
    err = jnp.sum(jnp.abs(safe_gt - pred), axis=-1)  # (B, H, W)
    return _masked_mean(elem_fn(err), pix_mask)


def laplacian_loss(pred, gt, conf, max_gtnorm: Optional[float] = None):
    """criterion.py:41-54: |err|/exp(conf) + conf."""
    return _conf_pixel_loss(
        pred, gt, lambda err: err / jnp.exp(conf) + conf, max_gtnorm
    )


def laplacian_loss_bounded(
    pred, gt, conf, max_gtnorm: float = 10000.0, a: float = 0.25, b: float = 4.0
):
    """criterion.py:56-69 (CroCo-Flow): c=(b-a)*sigmoid(conf)+a;
    |err|/c + log(c)."""
    c = (b - a) * jax.nn.sigmoid(conf) + a
    return _conf_pixel_loss(
        pred, gt, lambda err: err / c + jnp.log(c), max_gtnorm
    )


def laplacian_loss_bounded2(
    pred, gt, conf, max_gtnorm: Optional[float] = None, a: float = 3.0,
    b: float = 3.0,
):
    """criterion.py:71-85 (CroCo-Stereo): c=2a*(sigmoid(conf/b)-0.5);
    |err|/exp(c) + c."""
    c = 2.0 * a * (jax.nn.sigmoid(conf / b) - 0.5)
    return _conf_pixel_loss(
        pred, gt, lambda err: err / jnp.exp(c) + c, max_gtnorm
    )


@dataclasses.dataclass(frozen=True)
class Criterion:
    """A named reference criterion: fn(pred, gt[, conf]) and whether it
    consumes a confidence channel (test.py:60-62 uses with_conf to size the
    model's output head)."""

    name: str
    fn: Callable
    with_conf: bool


CRITERIA: Dict[str, Criterion] = {
    "L1Loss()": Criterion("L1Loss()", l1_loss, False),
    "LaplacianLoss()": Criterion("LaplacianLoss()", laplacian_loss, True),
    "LaplacianLossBounded()": Criterion(
        "LaplacianLossBounded()", laplacian_loss_bounded, True
    ),
    "LaplacianLossBounded2()": Criterion(
        "LaplacianLossBounded2()", laplacian_loss_bounded2, True
    ),
}
# train.py:52 task defaults
DEFAULT_CRITERION = {"stereo": "LaplacianLossBounded2()",
                     "flow": "LaplacianLossBounded()"}
DEFAULT_TILE_CONF_MODE = {"stereo": "conf_expsigmoid_15_3",
                          "flow": "conf_expsigmoid_10_5"}
DEFAULT_CROP = {"stereo": (352, 704), "flow": (320, 384)}


# ---------------------------------------------------------------------------
# per-batch metrics (criterion.py:88-133)
# ---------------------------------------------------------------------------


def stereo_metrics(pred, gt) -> Dict[str, jnp.ndarray]:
    """criterion.py:88-110: avgerr, rmse, bad@{0.5,1,2,3} (percent)."""
    B = pred.shape[0]
    mask = jnp.isfinite(gt)
    gtc = jnp.where(mask, gt, 999999.0)
    npx = jnp.maximum(mask.reshape(B, -1).sum(axis=1), 1)
    l1 = (jnp.abs(gtc - pred) * mask).reshape(B, -1)
    l2 = (jnp.square(gtc - pred) * mask).reshape(B, -1)
    out = {
        "avgerr": jnp.mean(l1.sum(axis=1) / npx),
        "rmse": jnp.mean(jnp.sqrt(l2.sum(axis=1) / npx)),
    }
    for th in (0.5, 1.0, 2.0, 3.0):
        bad = ((l1 > th) & mask.reshape(B, -1)).sum(axis=1) / npx
        out[f"bad@{th:.1f}"] = jnp.mean(bad) * 100.0
    return out


def flow_metrics(pred, gt) -> Dict[str, jnp.ndarray]:
    """criterion.py:113-133: L1err, EPE, bad@{1,3,5} (percent, on EPE)."""
    B = pred.shape[0]
    mask = jnp.isfinite(gt[..., 0])
    gtc = jnp.where(jnp.isfinite(gt), gt, 999999.0)
    npx = jnp.maximum(mask.reshape(B, -1).sum(axis=1), 1)
    l1 = (jnp.sum(jnp.abs(gtc - pred), axis=-1) * mask).reshape(B, -1)
    l2 = (
        jnp.sqrt(jnp.sum(jnp.square(gtc - pred), axis=-1)) * mask
    ).reshape(B, -1)
    out = {
        "L1err": jnp.mean(l1.sum(axis=1) / npx),
        "EPE": jnp.mean(l2.sum(axis=1) / npx),
    }
    for th in (1.0, 3.0, 5.0):
        bad = ((l2 > th) & mask.reshape(B, -1)).sum(axis=1) / npx
        out[f"bad@{th:.1f}"] = jnp.mean(bad) * 100.0
    return out


# ---------------------------------------------------------------------------
# per-dataset running metrics (criterion.py:140-250) — host-side accumulators
# ---------------------------------------------------------------------------


def _spring_min_subsample(err_fn, gt, pred):
    """The Spring special case (criterion.py:237-245 / :199-205): gt is at
    2x the prediction resolution; take the min error over the 4 subsamples."""
    cands = [
        err_fn(gt[:, 0::2, 0::2], pred),
        err_fn(gt[:, 1::2, 0::2], pred),
        err_fn(gt[:, 0::2, 1::2], pred),
        err_fn(gt[:, 1::2, 1::2], pred),
    ]
    return np.minimum.reduce(cands)


class StereoDatasetMetrics:
    """criterion.py:140-182: running L1err mean + bad@th counters."""

    bad_ths = (0.5, 1.0, 2.0, 3.0)

    def __init__(self):
        self.reset()

    def reset(self):
        self.agg_n = 0
        self.agg_l1 = 0.0
        self.agg_nbad = [0 for _ in self.bad_ths]

    def add_batch(self, pred, gt):
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        assert pred.shape[-1] == 1 and gt.shape[-1] == 1
        if (gt.shape[1] == pred.shape[1] * 2
                and gt.shape[2] == pred.shape[2] * 2):  # Spring
            l1 = _spring_min_subsample(
                lambda g, p: np.sum(np.abs(g - p), axis=-1), gt, pred)
            valid = np.isfinite(l1)
        else:
            valid = np.isfinite(gt[..., 0])
            l1 = np.sum(np.abs(gt - pred), axis=-1)
        n = int(valid.sum())
        if n == 0:
            return
        nnew = self.agg_n + n
        self.agg_l1 = (
            self.agg_n / nnew * self.agg_l1
            + float(l1[valid].mean()) * n / nnew
        )
        self.agg_n = nnew
        for i, th in enumerate(self.bad_ths):
            self.agg_nbad[i] += int((l1[valid] > th).sum())

    def get_results(self) -> Dict[str, float]:
        out = {"L1err": self.agg_l1}
        for i, th in enumerate(self.bad_ths):
            out[f"bad@{th:.1f}"] = self.agg_nbad[i] / max(self.agg_n, 1) * 100.0
        return out


class FlowDatasetMetrics:
    """criterion.py:184-250: running L1/EPE means, bad@th, EPE per speed bin."""

    bad_ths = (0.5, 1.0, 3.0, 5.0)
    speed_ths = ((0, 10), (10, 40), (40, np.inf))

    def __init__(self):
        self.reset()

    def reset(self):
        self.agg_n = 0
        self.agg_l1 = 0.0
        self.agg_l2 = 0.0
        self.agg_nbad = [0 for _ in self.bad_ths]
        self.agg_epespeed = [0.0 for _ in self.speed_ths]
        self.agg_nspeed = [0 for _ in self.speed_ths]

    def add_batch(self, pred, gt):
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        assert pred.shape[-1] == 2 and gt.shape[-1] == 2
        if (gt.shape[1] == pred.shape[1] * 2
                and gt.shape[2] == pred.shape[2] * 2):  # Spring
            l1 = _spring_min_subsample(
                lambda g, p: np.sum(np.abs(g - p), axis=-1), gt, pred)
            l2 = _spring_min_subsample(
                lambda g, p: np.sqrt(np.sum(np.square(g - p), axis=-1)),
                gt, pred)
            valid = np.isfinite(l1)
            gtspeed = (
                np.sqrt(np.sum(np.square(gt[:, 0::2, 0::2]), axis=-1))
                + np.sqrt(np.sum(np.square(gt[:, 0::2, 1::2]), axis=-1))
                + np.sqrt(np.sum(np.square(gt[:, 1::2, 0::2]), axis=-1))
                + np.sqrt(np.sum(np.square(gt[:, 1::2, 1::2]), axis=-1))
            ) / 4.0
        else:
            valid = np.isfinite(gt[..., 0])
            l1 = np.sum(np.abs(gt - pred), axis=-1)
            l2 = np.sqrt(np.sum(np.square(gt - pred), axis=-1))
            gtspeed = np.sqrt(np.sum(np.square(gt), axis=-1))
        n = int(valid.sum())
        if n == 0:
            return
        nnew = self.agg_n + n
        self.agg_l1 = (
            self.agg_n / nnew * self.agg_l1
            + float(l1[valid].mean()) * n / nnew
        )
        self.agg_l2 = (
            self.agg_n / nnew * self.agg_l2
            + float(l2[valid].mean()) * n / nnew
        )
        self.agg_n = nnew
        for i, th in enumerate(self.bad_ths):
            self.agg_nbad[i] += int((l2[valid] > th).sum())
        for i, (t1, t2) in enumerate(self.speed_ths):
            vv = (gtspeed[valid] >= t1) & (gtspeed[valid] < t2)
            ns = int(vv.sum())
            if ns == 0:
                continue
            nn = self.agg_nspeed[i] + ns
            self.agg_epespeed[i] = (
                self.agg_nspeed[i] / nn * self.agg_epespeed[i]
                + ns / nn * float(l2[valid][vv].mean())
            )
            self.agg_nspeed[i] = nn

    def get_results(self) -> Dict[str, float]:
        out = {"L1err": self.agg_l1, "EPE": self.agg_l2}
        for i, th in enumerate(self.bad_ths):
            out[f"bad@{th:.1f}"] = self.agg_nbad[i] / max(self.agg_n, 1) * 100.0
        for i, (t1, t2) in enumerate(self.speed_ths):
            key = f"s{int(t1):d}" + (f"-{int(t2):d}" if np.isfinite(t2) else "+")
            out[key] = self.agg_epespeed[i]
        return out


# ---------------------------------------------------------------------------
# tiled inference (engine.py:179-271)
# ---------------------------------------------------------------------------


def overlapping_starts(total: int, window: int, overlap: float) -> np.ndarray:
    """engine.py:267-271."""
    assert total >= window and 0 <= overlap < 1, (total, window, overlap)
    num_windows = 1 + int(np.ceil((total - window) / ((1 - overlap) * window)))
    return np.linspace(0, total - window, num_windows).round().astype(int)


def _cubic_kernel_torch(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """torch's bicubic convolution kernel (Keys, A=-0.75)."""
    at = np.abs(t)
    w = np.where(
        at <= 1,
        ((A + 2) * at - (A + 3)) * at * at + 1,
        np.where(at < 2, A * (((at - 5) * at + 8) * at - 4), 0.0),
    )
    return w


def _cubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) torch bicubic interp matrix, align_corners=False, border
    replication (torch clamps source indices)."""
    M = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        f = int(np.floor(src))
        t = src - f
        idx = np.array([f - 1, f, f + 1, f + 2])
        w = _cubic_kernel_torch(t - np.array([-1.0, 0.0, 1.0, 2.0]))
        for i, wi in zip(idx, w):
            M[o, int(np.clip(i, 0, in_size - 1))] += wi
    return M.astype(np.float32)


def resize_bicubic_torch(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bicubic resize with torch F.interpolate(mode='bicubic',
    align_corners=False) semantics (engine.py:163-164)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x
    Mh = jnp.asarray(_cubic_matrix(H, oh))
    Mw = jnp.asarray(_cubic_matrix(W, ow))
    x = jnp.einsum("oh,bhwc->bowc", Mh, x)
    return jnp.einsum("pw,bhwc->bhpc", Mw, x)


def resize_stereo_or_flow(data: jnp.ndarray, out_hw: Tuple[int, int]):
    """engine.py:165-175: bicubic resize + value rescale (x by width ratio,
    y channel by height ratio). data (B, H, W, C<=2)."""
    B, H, W, C = data.shape
    out = resize_bicubic_torch(data, out_hw)
    scale_x = out_hw[1] / float(W)
    chans = [out[..., 0] * scale_x]
    if C == 2:
        chans.append(out[..., 1] * (out_hw[0] / float(H)))
    return jnp.stack(chans, axis=-1)


def tile_conf_weight(predconf: jnp.ndarray, conf_mode: str) -> jnp.ndarray:
    """engine.py:239-242: aggregation weight from the confidence channel."""
    if conf_mode.startswith("conf_expsigmoid_"):
        beta, betasigmoid = map(
            float, conf_mode[len("conf_expsigmoid_"):].split("_"))
        return jnp.exp(-beta * 2.0 * (jax.nn.sigmoid(predconf / betasigmoid)
                                      - 0.5))
    if conf_mode.startswith("conf_expbeta"):
        beta = float(conf_mode[len("conf_expbeta"):])
        return jnp.exp(-beta * predconf)
    raise NotImplementedError(f"conf_mode {conf_mode} is not implemented")


def tiled_pred(
    apply_fn: Callable,
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    gt: Optional[jnp.ndarray] = None,
    *,
    crop: Tuple[int, int] = (352, 704),
    overlap: float = 0.5,
    conf_mode: str = "conf_expsigmoid_10_5",
    criterion: Optional[Criterion] = None,
):
    """engine.py:179-264 as ONE jittable program.

    apply_fn(img1_tiles, img2_tiles) -> (pred (T, h, w, C), conf (T, h, w))
    where conf may be None only if the model has no confidence channel —
    then conf_mode weighting degenerates to uniform averaging like the
    reference would divide by constant weights.

    Returns (pred (B, H, W, C), mean tiled loss (or nan), conf map (B, H, W)).
    """
    B, H, W, _ = img1.shape
    win_h, win_w = crop

    # up-scale to cover the crop (engine.py:194-204; the reference computes
    # BOTH ratios against W — reproduced verbatim for parity)
    original_hw = None
    if H < win_h or W < win_w:
        upscale = max(win_w / W, win_h / W)
        original_hw = (H, W)
        new_hw = (round(H * upscale), round(W * upscale))
        img1 = resize_bicubic_torch(img1, new_hw)
        img2 = resize_bicubic_torch(img2, new_hw)
        if gt is not None:
            gt = resize_stereo_or_flow(gt, new_hw)
        H, W = new_hw

    sys_ = overlapping_starts(H, win_h, overlap)
    sxs = overlapping_starts(W, win_w, overlap)
    tiles = [(int(sy), int(sx)) for sy in sys_ for sx in sxs]

    # gather ALL tiles into one batched forward (reference: one model call
    # per tile, engine.py:230-232)
    t1 = jnp.concatenate(
        [img1[:, sy:sy + win_h, sx:sx + win_w] for sy, sx in tiles], axis=0)
    t2 = jnp.concatenate(
        [img2[:, sy:sy + win_h, sx:sx + win_w] for sy, sx in tiles], axis=0)
    pred_t, conf_t = apply_fn(t1, t2)
    C = pred_t.shape[-1]
    if conf_t is None:
        conf_t = jnp.zeros(pred_t.shape[:-1], pred_t.dtype)

    accu_pred = jnp.zeros((B, H, W, C), pred_t.dtype)
    accu_conf = jnp.full((B, H, W), 1e-16, pred_t.dtype)
    accu_c = jnp.zeros((B, H, W), pred_t.dtype)
    losses = []
    w_t = tile_conf_weight(conf_t, conf_mode)
    for i, (sy, sx) in enumerate(tiles):
        p = pred_t[i * B:(i + 1) * B]
        pc = conf_t[i * B:(i + 1) * B]
        w = w_t[i * B:(i + 1) * B]
        if criterion is not None and gt is not None:
            gtc = gt[:, sy:sy + win_h, sx:sx + win_w]
            losses.append(
                criterion.fn(p, gtc, pc) if criterion.with_conf
                else criterion.fn(p, gtc))
        accu_pred = accu_pred.at[:, sy:sy + win_h, sx:sx + win_w].add(
            p * w[..., None])
        accu_conf = accu_conf.at[:, sy:sy + win_h, sx:sx + win_w].add(w)
        accu_c = accu_c.at[:, sy:sy + win_h, sx:sx + win_w].add(pc * w)

    pred = accu_pred / accu_conf[..., None]
    c = accu_c / accu_conf
    loss = jnp.mean(jnp.stack(losses)) if losses else jnp.float32(jnp.nan)

    if original_hw is not None:
        pred = resize_stereo_or_flow(pred, original_hw)
    return pred, loss, c


# ---------------------------------------------------------------------------
# training (train.py:50-75 defaults; AdamW betas (0.9, 0.95), wd 0.05,
# per-iteration warmup+cosine like croco's utils.misc.adjust_learning_rate)
# ---------------------------------------------------------------------------


def make_stereoflow_optimizer(
    lr: float, total_steps: int, warmup_steps: int, weight_decay: float = 0.05,
    min_lr: float = 0.0,
):
    import optax

    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=min_lr)
    return optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=weight_decay)


def build_stereoflow_train_step(model, criterion: Criterion, tx):
    """One jitted fwd/bwd/update step: (params, opt_state, img1, img2, gt)
    -> (params, opt_state, loss). Inputs ImageNet-normalized NHWC."""

    def loss_fn(params, img1, img2, gt):
        pred, conf = model.apply({"params": params}, img1, img2)
        if criterion.with_conf:
            return criterion.fn(pred, gt, conf)
        return criterion.fn(pred, gt)

    @jax.jit
    def step(params, opt_state, img1, img2, gt):
        import optax

        loss, grads = jax.value_and_grad(loss_fn)(params, img1, img2, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
