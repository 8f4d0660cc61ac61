"""PF-PASCAL semantic-transfer PCK evaluation (CPU-runnable).

Parity target: src/evaluate_timm.py:351-588 — square-canvas resize to 640,
padded keypoints, dense student features (ImageNet normalization,
refine_conv when present), target features bilinearly upsampled
(align_corners=True) to the patch-center grid and edge-padded back to 640^2,
source keypoint features sampled with patch-center alignment, argmax over
640^2 similarities, PCK@{0.05,0.10,0.15}*640 per category + weighted mean.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from PIL import Image

from gd3d.models.dpt import resize_bilinear_ac
from gd3d.models.student import Student
from gd3d.ops.interpolate import interpolate_features

PASCAL_CATEGORIES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle",
    "bus", "car", "cat", "chair", "cow",
    "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]
CATEGORY_WEIGHTS = [15, 30, 10, 6, 8, 32, 19, 27, 13, 3,
                    8, 24, 9, 27, 12, 7, 1, 13, 20, 15]


def preprocess_kps_pad(kps: np.ndarray, w: int, h: int, size: int):
    """utils/functions.py:144-166: rescale + center-offset padded keypoints."""
    kps = kps.copy()
    scale = size / max(w, h)
    kps[:, :2] *= scale
    if h < w:
        new_h = int(np.around(size * h / w))
        kps[:, 1] += (size - new_h) // 2
    elif w < h:
        new_w = int(np.around(size * w / h))
        kps[:, 0] += (size - new_w) // 2
    kps *= kps[:, 2:3].copy()  # zero out non-visible
    return kps


def resize_to_canvas(img: Image.Image, target_res: int) -> np.ndarray:
    """src/evaluate_timm.py:351-396 (edge=False): black square canvas."""
    w, h = img.size
    canvas = np.zeros((target_res, target_res, 3), np.uint8)
    if h <= w:
        img = img.resize(
            (target_res, int(np.around(target_res * h / w))),
            Image.Resampling.LANCZOS,
        )
        w2, h2 = img.size
        canvas[(w2 - h2) // 2 : (w2 + h2) // 2] = np.asarray(img)
    else:
        img = img.resize(
            (int(np.around(target_res * w / h)), target_res),
            Image.Resampling.LANCZOS,
        )
        w2, h2 = img.size
        canvas[:, (h2 - w2) // 2 : (h2 + w2) // 2] = np.asarray(img)
    return canvas


def resolve_pascal_csv(path: str, same_view: bool) -> str:
    """Pair-CSV path, falling back to the in-tree vendored copy (repo
    data/) when the user's PF-PASCAL dir has none — the reference expects
    the CSVs copied into data/PF-dataset-PASCAL/."""
    name = f"test_pairs_pf_{'same' if same_view else 'different'}_views.csv"
    csv = os.path.join(path, name)
    if not os.path.isfile(csv):
        vendored = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "data", name)
        if os.path.isfile(vendored):
            return vendored
    return csv


def load_pascal_pairs(
    path: str, size: int, category: str, same_view: bool
) -> Tuple[List[str], np.ndarray]:
    """src/evaluate_timm.py:399-458.

    The pair CSVs ship in-tree (repo data/, see data/README.md) exactly as
    the reference vendors them; when the user's PF-PASCAL dir has no copy
    (the reference expects them copied into data/PF-dataset-PASCAL/), the
    vendored ones are used."""
    data = pd.read_csv(resolve_pascal_csv(path, same_view))
    cls_ids = data.iloc[:, 2].values.astype(int) - 1
    cat_id = PASCAL_CATEGORIES.index(category)
    subset = data.iloc[np.where(cls_ids == cat_id)[0], :]

    def get_points(series, idx):
        X = np.fromstring(series.iloc[idx, 0], sep=";")
        Y = np.fromstring(series.iloc[idx, 1], sep=";")
        Xpad = -np.ones(20)
        Ypad = -np.ones(20)
        Zmask = np.zeros(20)
        Xpad[: len(X)] = X
        Ypad[: len(X)] = Y
        Zmask[: len(X)] = 1
        return np.stack([Xpad, Ypad, Zmask], axis=1).astype(np.float32)

    files, kps = [], []
    pA = subset.iloc[:, 3:5]
    pB = subset.iloc[:, 5:]
    for i in range(len(subset)):
        for names, pts in ((subset.iloc[i, 0], get_points(pA, i)),
                           (subset.iloc[i, 1], get_points(pB, i))):
            fn = f"{path}/../{names}"
            im_size = Image.open(fn).size
            kp = preprocess_kps_pad(pts, im_size[0], im_size[1], size)
            files.append(fn)
            kps.append(kp)
    kps = np.stack(kps)
    used = np.where(kps[:, :, 2].any(axis=0))[0]
    return files, kps[:, used, :]


def dense_eval_features(
    student: Student, params: dict, img_canvas: np.ndarray, refine: bool = True
) -> jnp.ndarray:
    """Dense 640-canvas features: (1, ph, pw, C)."""
    x = jnp.asarray(img_canvas[None].astype(np.float32) / 255.0)
    return student.dense_grid_features(params, x, refine=refine)


def make_match_fn(student: Student, img_size: int = 640, refine: bool = True,
                  max_kps: int = 20, batch_pairs: int = 8):
    """Build the jitted pair-matching fn (evaluate_timm.py:516-547): one XLA
    program reused across every PF-PASCAL pair (the reference re-dispatches
    eagerly per pair). Keypoints are padded to max_kps.

    The jitted program is BATCHED over `batch_pairs` pairs per dispatch and
    takes uint8 canvases (normalized on device): on the remote-tunnel TPU
    the per-pair cost was dominated by the ~40 ms dispatch + 10 MB fp32
    canvas transfer, not device compute (PERF_NOTES eval section) — batching
    amortizes the former, u8 quarters the latter. The returned `match`
    closure keeps the single-pair API; `match.many(params, pairs)` runs a
    list of (img1_u8, img2_u8, kps1) through full batches."""
    ps = student.cfg.patch_size

    @jax.jit
    def fn(params, img1, img2, kps1):
        # (B, S, S, 3) uint8 -> fp32 on device; (B, N, 2) keypoints
        x1 = img1.astype(jnp.float32) / 255.0
        x2 = img2.astype(jnp.float32) / 255.0
        d1 = student.dense_grid_features(params, x1, refine=refine)
        d2 = student.dense_grid_features(params, x2, refine=refine)
        ds_size = ((img_size - ps) // ps) * ps + 1
        # QUIRK: the reference samples kp descriptors with
        # interpolate_features' DEFAULT patch_size=14/stride=14 alignment
        # (utils/functions.py:55, "borrowed from DINO-Tracker") even though
        # the descriptor grid is patch-16 (evaluate_timm.py:542 passes no
        # patch/stride) — reproduced verbatim for identical PCK; locked by
        # tests/test_reference_eval_parity.py
        kp_desc = interpolate_features(
            d1.transpose(0, 3, 1, 2), kps1,
            h=img_size, w=img_size, normalize=True, patch_size=14, stride=14,
        )  # (B, C, N)
        # The reference upsamples the dense target features to 640^2 and
        # THEN dots (evaluate_timm.py:516-547) — a (B, 640, 640, 768) fp32
        # intermediate (1.26 GB/pair). Bilinear-resize + edge-pad are
        # per-channel LINEAR maps, so the keypoint dot commutes through
        # them: dot on the patch grid first, then upsample the N-channel
        # similarity map. Identical values up to fp summation order;
        # 768/N fewer bytes and ~256x fewer MACs in the big contraction.
        sim_patch = jnp.einsum("bcn,bhwc->bhwn", kp_desc, d2)
        sim_up = resize_bilinear_ac(sim_patch, (ds_size, ds_size))
        pad_l = ps // 2
        pad_r = img_size - ds_size - pad_l
        sim_full = jnp.pad(
            sim_up, ((0, 0), (pad_l, pad_r), (pad_l, pad_r), (0, 0)),
            mode="edge",
        )  # (B, 640, 640, N)
        sim = sim_full.transpose(0, 3, 1, 2).reshape(
            kps1.shape[0], kps1.shape[1], -1
        )
        nn_idx = jnp.argmax(sim, axis=-1)
        return jnp.stack([nn_idx % img_size, nn_idx // img_size], axis=-1)

    def _pad_kps(kps1):
        pad = max(0, max_kps - kps1.shape[0])
        kps_p = np.pad(kps1[:, :2].astype(np.float32), ((0, pad), (0, 0)))
        return kps_p[:max_kps]

    def match(params, img1_canvas, img2_canvas, kps1):
        n = kps1.shape[0]
        out = fn(
            params,
            jnp.asarray(img1_canvas[None].astype(np.uint8)),
            jnp.asarray(img2_canvas[None].astype(np.uint8)),
            jnp.asarray(_pad_kps(kps1)[None]),
        )
        return np.asarray(out)[0, :n]

    def match_many(params, pairs):
        """pairs: list of (img1_u8, img2_u8, kps1 (n_i, >=2)) -> list of
        (n_i, 2) predictions. Chunks into `batch_pairs`-sized dispatches,
        padding the tail chunk by repetition (identical numerics to the
        per-pair path: batching only stacks independent programs)."""
        preds = []
        for lo in range(0, len(pairs), batch_pairs):
            chunk = pairs[lo: lo + batch_pairs]
            pad_n = batch_pairs - len(chunk)
            padded = chunk + [chunk[-1]] * pad_n
            i1 = np.stack([p[0] for p in padded]).astype(np.uint8)
            i2 = np.stack([p[1] for p in padded]).astype(np.uint8)
            kp = np.stack([_pad_kps(p[2]) for p in padded])
            out = np.asarray(fn(params, jnp.asarray(i1), jnp.asarray(i2),
                                jnp.asarray(kp)))
            preds.extend(out[i, : chunk[i][2].shape[0]]
                         for i in range(len(chunk)))
        return preds

    match.many = match_many
    return match


def match_pair(
    student: Student,
    params: dict,
    img1: np.ndarray,
    img2: np.ndarray,
    kps1: np.ndarray,
    img_size: int = 640,
    refine: bool = True,
) -> np.ndarray:
    """Predict img2 positions for img1 keypoints (single-shot convenience)."""
    return make_match_fn(student, img_size, refine, max_kps=kps1.shape[0])(
        params, img1, img2, kps1
    )


def semantic_transfer(
    student: Student,
    params: dict,
    data_path: str,
    categories: Optional[Sequence[str]] = None,
    same_view: bool = False,
    img_size: int = 640,
    refine: bool = True,
    alphas: Sequence[float] = (0.1, 0.05, 0.15),
) -> pd.DataFrame:
    """Full PCK table (evaluate_timm.py:461-588)."""
    categories = list(categories or PASCAL_CATEGORIES)
    results = {a: [] for a in alphas}
    kept: List[str] = []
    match = make_match_fn(student, img_size, refine, max_kps=20)
    for cat in categories:
        files, kps = load_pascal_pairs(data_path, img_size, cat, same_view)
        if len(files) < 2:  # category absent from the pair CSV
            continue
        kept.append(cat)
        pairs, vis_all, gt_all = [], [], []
        for pair_idx in range(len(files) // 2):
            img1 = resize_to_canvas(
                Image.open(files[2 * pair_idx]).convert("RGB"), img_size
            )
            img2 = resize_to_canvas(
                Image.open(files[2 * pair_idx + 1]).convert("RGB"), img_size
            )
            k1 = kps[2 * pair_idx]
            k2 = kps[2 * pair_idx + 1]
            vis = k1[:, 2] * k2[:, 2] > 0
            pairs.append((img1, img2, k1))
            vis_all.append(vis)
            gt_all.append(k2[vis][:, [1, 0]])
        preds = match.many(params, pairs)
        pred_all = [p[v][:, [1, 0]] for p, v in zip(preds, vis_all)]
        gt = np.concatenate(gt_all, 0)
        pred = np.concatenate(pred_all, 0)
        err = np.linalg.norm(pred - gt, axis=-1)
        for a in alphas:
            results[a].append(float((err < a * img_size).mean()))

    cols = {f"PCK{a:.2f}": results[a] for a in sorted(alphas)}
    df = pd.DataFrame(cols)
    df["categories"] = kept
    df.set_index(["categories"], inplace=True)
    # per-category pair-count weights, mapped by name so category subsets
    # and absent categories weight correctly (evaluate_timm.py:554-588)
    weights = [CATEGORY_WEIGHTS[PASCAL_CATEGORIES.index(c)] for c in kept]
    for col in cols:
        df[f"Weighted {col}"] = np.average(df[col], weights=weights)
    return df
