"""Global alignment of pairwise MASt3R/DUSt3R predictions (cloud_opt).

Parity target: the DUSt3R global-alignment subsystem —
  - PointCloudOptimizer: per-image log-depthmaps / quat+signed-log1p poses /
    log-focals / principal-point offsets, per-edge sim3 poses + xy/z scale
    adaptors, confidence-weighted 3D consistency loss
    (dust3r/dust3r/cloud_opt/optimizer.py:16-208, base_opt.py:143-196,
    commons.py:62-90)
  - the Adam loop with cosine/linear lr schedule
    (base_opt.py:326-361)
  - PairViewer: the no-optimization 2-image fast path
    (dust3r/dust3r/cloud_opt/pair_viewer.py:20-110)

TPU-first redesign: images share one static (H, W) so every per-image and
per-edge quantity is a stacked array (the reference ravels + zero-fills to
max_area, optimizer.py:215-235 — here uniformity is a requirement, matching
this pipeline's fixed-geometry batches); the ENTIRE optimization runs as one
`lax.scan` jit (the reference steps Adam from Python per iteration with a
tqdm bar) with the cosine/linear lr schedule inside optax. Initialization
replaces the reference's MST +
PnP/RANSAC init (init_im_poses.py) with a confidence-weighted Umeyama
spanning-tree chain: symmetric edges give every image's points in both its
own and its partner's frame, so the relative sim3 comes from one closed-form
Procrustes per edge — no RANSAC, no host/device ping-pong.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gd3d.models.vggt.heads import quat_to_mat  # scalar-last (x, y, z, w)

POSE_LR = 0.01
PW_BREAK = 20.0  # log-scale divisor for adaptors (base_opt.py:88)
FOCAL_BREAK = 20.0  # log-focal scaling (optimizer.py:22)
BASE_SCALE = 0.5  # pairwise scale norm target (base_opt.py:48)


# --------------------------------------------------------------------------
# small math helpers
# --------------------------------------------------------------------------

def signed_log1p(x):
    """numpy-side inverse of signed_expm1 (init-time pose packing)."""
    return np.sign(x) * np.log1p(np.abs(x))


def signed_expm1(x):
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def pose_vec_to_rt(vec):
    """(…, 7) quat(xyzw) + signed-log1p translation -> (…, 4, 4) rigid
    (base_opt.py:150-155; the quaternion is normalized like roma's
    RigidUnitQuat.normalize)."""
    q = vec[..., :4]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    R = quat_to_mat(q)
    T = signed_expm1(vec[..., 4:7])
    top = jnp.concatenate([R, T[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def mat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> scalar-last unit quaternion (host-side init)."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        w, x, y, z = 0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s
    elif m00 > m11 and m00 > m22:
        s = math.sqrt(1.0 + m00 - m11 - m22) * 2
        w, x, y, z = (m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s
    elif m11 > m22:
        s = math.sqrt(1.0 + m11 - m00 - m22) * 2
        w, x, y, z = (m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s
    else:
        s = math.sqrt(1.0 + m22 - m00 - m11) * 2
        w, x, y, z = (m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s
    return np.asarray([x, y, z, w], np.float64)


def weighted_umeyama(src: np.ndarray, dst: np.ndarray, w: np.ndarray):
    """Closed-form sim3 (s, R, t) minimizing ||s R src + t - dst||²_w.

    The init-time substitute for the reference's RANSAC/PnP pipeline
    (init_im_poses.py) — pairwise predictions are already metric point
    clouds, so Procrustes is exact up to their noise."""
    w = w / max(w.sum(), 1e-12)
    mu_s = (w[:, None] * src).sum(0)
    mu_d = (w[:, None] * dst).sum(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = (w[:, None] * xd).T @ xs
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (w * (xs**2).sum(-1)).sum()
    s = float((D * np.diag(S)).sum() / max(var_s, 1e-12))
    t = mu_d - s * (R @ mu_s)
    return s, R, t


# --------------------------------------------------------------------------
# scene container
# --------------------------------------------------------------------------

@dataclass
class Scene:
    """Stacked pairwise observations for one static (H, W) geometry.

    edges[e] = (i, j); pred_i[e] = image i's 3D points in frame i,
    pred_j[e] = image j's 3D points in frame i (dust3r convention,
    optimizer.py:17-20); conf_* are the matching confidence maps."""

    edges: np.ndarray          # (E, 2) int
    pred_i: jnp.ndarray        # (E, P, 3)
    pred_j: jnp.ndarray        # (E, P, 3)
    conf_i: jnp.ndarray        # (E, P)
    conf_j: jnp.ndarray        # (E, P)
    hw: Tuple[int, int]
    n_imgs: int
    # per-image (x, y) pixel coordinates of the P sample points; None means
    # the dense H*W grid (sparse_from_scene sets it for anchor subsets)
    pix: Optional[np.ndarray] = None   # (N, P, 2)

    @staticmethod
    def from_pairs(
        edges: Sequence[Tuple[int, int]],
        pred_i: Sequence[np.ndarray],
        pred_j: Sequence[np.ndarray],
        conf_i: Sequence[np.ndarray],
        conf_j: Sequence[np.ndarray],
    ) -> "Scene":
        hw = tuple(pred_i[0].shape[:2])
        for p in list(pred_i) + list(pred_j):
            assert tuple(p.shape[:2]) == hw, (
                "TPU-first constraint: one static (H, W) per scene — bucket "
                "mixed-geometry scenes before aligning")
        E = len(edges)
        n = int(max(max(e) for e in edges)) + 1
        flat = lambda xs, c: jnp.asarray(  # noqa: E731
            np.stack([np.asarray(x).reshape(-1, c) if c > 1 else
                      np.asarray(x).reshape(-1) for x in xs]), jnp.float32)
        return Scene(
            edges=np.asarray(edges, np.int32).reshape(E, 2),
            pred_i=flat(pred_i, 3), pred_j=flat(pred_j, 3),
            conf_i=flat(conf_i, 1), conf_j=flat(conf_j, 1),
            hw=hw, n_imgs=n,
        )


def _pixel_grid(hw: Tuple[int, int]) -> jnp.ndarray:
    H, W = hw
    xs, ys = jnp.meshgrid(jnp.arange(W), jnp.arange(H))
    return jnp.stack([xs, ys], -1).reshape(-1, 2).astype(jnp.float32)


def _estimate_focal(pred: np.ndarray, hw: Tuple[int, int],
                    pix: Optional[np.ndarray] = None) -> float:
    """Median-ratio focal from a camera-frame point map — the robust-median
    core of dust3r's estimate_focal_knowing_depth (Weiszfeld ~ geometric
    median; the median of per-pixel ratios is its 1-step approximation)."""
    H, W = hw
    pts = pred.reshape(-1, 3)
    if pix is None:
        pix = np.stack(
            np.meshgrid(np.arange(W), np.arange(H)), -1).reshape(-1, 2)
    uv = pix - np.asarray([W / 2, H / 2])
    z = pts[:, 2]
    xy = pts[:, :2]
    num = (uv * xy).sum(-1) * z
    den = (xy**2).sum(-1)
    ok = den > 1e-8
    return float(np.median(num[ok] / den[ok]))


# --------------------------------------------------------------------------
# initialization: confidence spanning tree + per-edge Procrustes
# --------------------------------------------------------------------------

def init_from_tree(scene: Scene) -> Dict[str, np.ndarray]:
    """cam2world poses, focals and depth inits from a max-confidence
    spanning tree of edges, chaining closed-form sim3s.

    Replaces init_im_poses.py:minimum_spanning_tree (which RANSAC-PnPs
    each edge); needs symmetric edge pairs (i, j) AND (j, i) — make_pairs
    symmetrizes by default (dust3r/image_pairs.py:26-29)."""
    E = len(scene.edges)
    conf_i = np.asarray(scene.conf_i)
    conf_j = np.asarray(scene.conf_j)
    pred_i = np.asarray(scene.pred_i)
    pred_j = np.asarray(scene.pred_j)
    edge_index = {(int(i), int(j)): e for e, (i, j) in enumerate(scene.edges)}
    score = {e: float(conf_i[e].mean() * conf_j[e].mean()) for e in range(E)}

    # per-image depth + focal from its most confident outgoing edge
    n = scene.n_imgs
    H, W = scene.hw
    best_edge = [-1] * n
    for e, (i, j) in enumerate(scene.edges):
        i = int(i)
        if best_edge[i] < 0 or score[e] > score[best_edge[i]]:
            best_edge[i] = e
    assert all(b >= 0 for b in best_edge), "every image needs an edge as i"
    depth0 = np.stack(
        [pred_i[best_edge[i]][:, 2].clip(1e-3) for i in range(n)])
    pix = None if scene.pix is None else np.asarray(scene.pix)
    focals0 = np.asarray([
        _estimate_focal(pred_i[best_edge[i]], scene.hw,
                        None if pix is None else pix[i])
        for i in range(n)
    ])

    # relative sim3 per (unordered) pair from the symmetric edge, when
    # available: T maps frame j -> frame i, aligning img j's points seen
    # in frame j (edge (j,i).pred_i) onto frame i (edge (i,j).pred_j)
    cam2world = [None] * n
    cam2world[0] = np.eye(4)
    visited = {0}
    pairs = sorted(
        ((score[e], int(i), int(j), e) for e, (i, j) in enumerate(scene.edges)),
        reverse=True)
    while len(visited) < n:
        progressed = False
        for _, i, j, e in pairs:
            if (i in visited) == (j in visited):
                continue
            rev = edge_index.get((j, i))
            if rev is None:
                continue
            # points of img j expressed in frame i and in frame j
            in_i = pred_j[e]
            in_j = pred_i[rev]
            w = np.minimum(conf_j[e], conf_i[rev])
            s, R, t = weighted_umeyama(in_j, in_i, w)
            T_j2i = np.eye(4)
            T_j2i[:3, :3] = s * R
            T_j2i[:3, 3] = t
            if i in visited:
                cam2world[j] = cam2world[i] @ T_j2i
                visited.add(j)
            else:
                cam2world[i] = cam2world[j] @ np.linalg.inv(T_j2i)
                visited.add(i)
            progressed = True
        if not progressed:
            raise ValueError(
                "edge graph is disconnected or lacks symmetric pairs")

    poses = np.stack(cam2world)
    # scale chained poses are sim3; renormalize rotation, fold scale into
    # translation+depth implicitly (the optimizer's pw scales absorb it)
    for k in range(n):
        R = poses[k][:3, :3]
        s = np.cbrt(max(np.linalg.det(R), 1e-12))
        poses[k][:3, :3] = R / s
        depth0[k] = depth0[k] * s
    return {"poses": poses, "focals": focals0, "depth": depth0}


# --------------------------------------------------------------------------
# the optimizer
# --------------------------------------------------------------------------

def _init_pw_poses(scene: Scene, init: Dict[str, np.ndarray],
                   norm_pw: bool = True) -> np.ndarray:
    """Per-edge sim3 init: register pred_i onto the initialized world
    points of image i (init_im_poses.py:init_from_pts3d:96-101), then fold
    the pairwise scale normalization back into depths/translations
    (:103-107) so the online norm_pw_scale leaves the init consistent."""
    H, W = scene.hw
    n = scene.n_imgs
    dense = np.stack(
        np.meshgrid(np.arange(W), np.arange(H)), -1).reshape(-1, 2)
    pix = None if scene.pix is None else np.asarray(scene.pix)
    world = []
    for k in range(n):
        d = init["depth"][k].reshape(-1)
        f = init["focals"][k]
        g = dense if pix is None else pix[k]
        rel = np.concatenate(
            [d[:, None] * (g - np.asarray([W / 2, H / 2])) / f,
             d[:, None]], -1)
        P = init["poses"][k]
        world.append(rel @ P[:3, :3].T + P[:3, 3])

    E = len(scene.edges)
    pw = np.zeros((E, 8), np.float32)
    log_s = np.zeros(E)
    pred_i = np.asarray(scene.pred_i)
    conf_i = np.asarray(scene.conf_i)
    for e, (i, j) in enumerate(scene.edges):
        s, R, t = weighted_umeyama(pred_i[e], world[int(i)], conf_i[e])
        pw[e, :4] = mat_to_quat(R)
        pw[e, 4:7] = signed_log1p(t / s)
        pw[e, 7] = np.log(max(s, 1e-8))
        log_s[e] = pw[e, 7]

    # the loss renormalizes pw log-scales to mean log(BASE_SCALE); rescale
    # the world (depths + image translations) by the same factor so the
    # registration above stays exact post-normalization. With preset poses
    # the normalization is OFF (preset_pose sets norm_pw_scale=False,
    # optimizer.py:78-82) and the world must keep its given scale.
    if norm_pw:
        s_factor = BASE_SCALE / float(np.exp(log_s.mean()))
        init["depth"] = init["depth"] * s_factor
        init["poses"] = init["poses"].copy()
        init["poses"][:, :3, 3] *= s_factor
    return pw


def _init_params(scene: Scene, init: Optional[Dict[str, np.ndarray]], rng,
                 norm_pw: bool = True):
    n, (H, W) = scene.n_imgs, scene.hw
    pw_poses = np.tile(
        np.asarray([0, 0, 0, 1, 0, 0, 0, 0], np.float32),
        (len(scene.edges), 1))
    if init is not None:
        # also rescales init in-place when norm_pw
        pw_poses = _init_pw_poses(scene, init, norm_pw)
    if init is None:
        P = scene.pred_i.shape[1]
        depth_log = jax.random.normal(rng, (n, P)) / 10.0 - 3.0
        im_poses = np.tile(
            np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32), (n, 1))
        focals_log = np.full(
            (n,), FOCAL_BREAK * math.log(max(H, W)), np.float32)
    else:
        depth_log = jnp.asarray(
            np.log(np.clip(init["depth"], 1e-6, None)), jnp.float32)
        im_poses = np.zeros((n, 7), np.float32)
        for k in range(n):
            # params ARE cam2world (get_im_poses semantics)
            im_poses[k, :4] = mat_to_quat(init["poses"][k][:3, :3])
            im_poses[k, 4:7] = signed_log1p(init["poses"][k][:3, 3])
        focals_log = FOCAL_BREAK * np.log(
            np.clip(init["focals"], 1.0, None)).astype(np.float32)
    return {
        "depth_log": jnp.asarray(depth_log, jnp.float32),
        "im_poses": jnp.asarray(im_poses, jnp.float32),
        "focals_log": jnp.asarray(focals_log, jnp.float32),
        "im_pp": jnp.zeros((n, 2), jnp.float32),
        # per-edge: quat + log1p-trans + log-scale (base_opt.py:90)
        "pw_poses": jnp.asarray(pw_poses, jnp.float32),
        "pw_adaptors": jnp.zeros((len(scene.edges), 2), jnp.float32),
    }


def _scene_loss(params, scene: Scene, grid, pp_base, ei, ej, wi, wj,
                dist: str, norm_pw: bool = True):
    """The PointCloudOptimizer forward (optimizer.py:187-208)."""
    H, W = scene.hw

    focals = jnp.exp(params["focals_log"] / FOCAL_BREAK)  # (N,)
    pp = pp_base + 10.0 * params["im_pp"]                 # (N, 2)
    depth = jnp.exp(params["depth_log"])                  # (N, P)

    # camera-frame points -> world (optimizer.py:203-208); grid (N, P, 2)
    rel = jnp.concatenate(
        [
            depth[..., None] * (grid - pp[:, None]) / focals[:, None, None],
            depth[..., None],
        ],
        axis=-1,
    )  # (N, P, 3)
    c2w = pose_vec_to_rt(params["im_poses"])              # (N, 4, 4)
    world = jnp.einsum("nab,npb->npa", c2w[:, :3, :3], rel) + c2w[:, None, :3, 3]

    # pairwise sim3 + adaptors (base_opt.py:143-196)
    pw_rt = pose_vec_to_rt(params["pw_poses"][:, :7])     # (E, 4, 4)
    log_scale = params["pw_poses"][:, 7]
    if norm_pw:  # base_opt.py:178-189; OFF with preset poses
        log_scale = log_scale + (math.log(BASE_SCALE) - jnp.mean(log_scale))
    pw_scale = jnp.exp(log_scale)
    adapt = jnp.concatenate(
        [params["pw_adaptors"][:, 0:1], params["pw_adaptors"]], axis=-1)
    if norm_pw:  # get_adaptors mean-centers only when norm_pw_scale is on
        adapt = adapt - jnp.mean(adapt, axis=1, keepdims=True)
    adapt = jnp.exp(adapt / PW_BREAK)                     # (E, 3)

    def edge_align(pred):
        scaled = adapt[:, None, :] * pred                 # (E, HW, 3)
        out = jnp.einsum("eab,epb->epa", pw_rt[:, :3, :3], scaled)
        return pw_scale[:, None, None] * out + (
            pw_scale[:, None, None] * pw_rt[:, None, :3, 3])

    aligned_i = edge_align(scene.pred_i)
    aligned_j = edge_align(scene.pred_j)

    def d(a, b, w):
        if dist == "l2":
            return jnp.sum((a - b) ** 2, -1) * w
        # safe L1: grad of sqrt at exactly-zero residuals (a perfect init)
        # is NaN otherwise
        return jnp.sqrt(jnp.sum((a - b) ** 2, -1) + 1e-12) * w

    P = scene.pred_i.shape[1]
    li = jnp.sum(d(world[ei], aligned_i, wi)) / (len(ei) * P)
    lj = jnp.sum(d(world[ej], aligned_j, wj)) / (len(ej) * P)
    return li + lj


def global_align(
    scene: Scene,
    niter: int = 300,
    lr: float = POSE_LR,
    lr_min: float = 1e-6,
    schedule: str = "cosine",
    dist: str = "l1",
    init: Optional[str] = "tree",
    known_poses: Optional[np.ndarray] = None,
    pose_mask: Optional[np.ndarray] = None,
    known_focals: Optional[np.ndarray] = None,
    focal_mask: Optional[np.ndarray] = None,
    known_pp: Optional[np.ndarray] = None,
    pp_mask: Optional[np.ndarray] = None,
    known_depths: Optional[np.ndarray] = None,
    depth_mask: Optional[np.ndarray] = None,
    optimize_pp: bool = False,
    allow_pw_adaptors: bool = False,
    seed: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Run the full alignment; returns poses/focals/depthmaps/pts3d/loss.

    The whole Adam loop (betas (0.9, 0.9), base_opt.py:337) is one jitted
    lax.scan; cosine or linear lr schedule per commons.py:77-88.

    Principal points and pairwise adaptors are FROZEN by default, matching
    the reference defaults (optimizer.py optimize_pp=False sets
    im_pp.requires_grad False; base_opt.py allow_pw_adaptors=False) —
    pass optimize_pp / allow_pw_adaptors to train them.

    Partial presets (ModularPointCloudOptimizer semantics,
    dust3r/cloud_opt/modular_optimizer.py:38-68): each known_* array can
    come with a boolean *_mask (N,) selecting which images it pins —
    preset values overwrite the init and their params are frozen (per-row
    stop_gradient); unmasked images keep optimizing. Without a mask, a
    known_* pins ALL images (PointCloudOptimizer.preset_* behavior,
    optimizer.py:68-102). known_poses are cam2world (N, 4, 4); known_focals
    (N,); known_pp (N, 2) pixels; known_depths (N, H, W) (or (N, P) on
    sparse scenes). Pairwise-scale normalization turns off once more than
    one pose is pinned (modular_optimizer.py:47-48).
    """
    n = scene.n_imgs

    def as_mask(mask, known):
        if known is None:
            return np.zeros(n, bool)
        if mask is None:
            return np.ones(n, bool)
        m = np.asarray(mask)
        if m.dtype != bool:  # index list
            out = np.zeros(n, bool)
            out[m] = True
            return out
        return m

    pose_mask = as_mask(pose_mask, known_poses)
    focal_mask = as_mask(focal_mask, known_focals)
    pp_mask = as_mask(pp_mask, known_pp)
    depth_mask = as_mask(depth_mask, known_depths)

    any_preset = any(
        k is not None
        for k in (known_poses, known_focals, known_pp, known_depths))
    init_state = None
    if init == "tree" or any_preset:
        init_state = init_from_tree(scene)
    if known_poses is not None:
        init_state["poses"] = np.where(
            pose_mask[:, None, None],
            np.asarray(known_poses, np.float64),
            init_state["poses"])
    if known_focals is not None:
        init_state["focals"] = np.where(
            focal_mask, np.asarray(known_focals, np.float64),
            init_state["focals"])
    if known_depths is not None:
        kd = np.asarray(known_depths, np.float64).reshape(n, -1)
        if scene.pix is not None and kd.shape[1] != scene.pred_i.shape[1]:
            # dense (N, H, W) depths on a sparse-anchor scene: gather
            W_im = scene.hw[1]
            lin = (scene.pix[..., 1] * W_im + scene.pix[..., 0]).astype(int)
            kd = np.take_along_axis(kd, lin, axis=1)
        init_state["depth"] = np.where(
            depth_mask[:, None], kd, init_state["depth"].reshape(n, -1))
    # pw-scale normalization turns off once the scene scale is externally
    # constrained — any pinned pose or depth map. (The reference keeps norm
    # on with exactly ONE pinned pose, modular_optimizer.py:47-48, but its
    # init then rescales the world and the single pinned translation drifts
    # relative to it; here pinned values stay exact instead.)
    norm_pw = not (pose_mask.any() or depth_mask.any())
    params = _init_params(scene, init_state, jax.random.key(seed),
                          norm_pw=norm_pw)
    if known_pp is not None:
        pp0 = np.asarray(known_pp, np.float32) - np.asarray(
            [[scene.hw[1] / 2, scene.hw[0] / 2]], np.float32)
        params["im_pp"] = jnp.asarray(
            np.where(pp_mask[:, None], pp0 / 10.0,
                     np.asarray(params["im_pp"])), jnp.float32)

    H, W = scene.hw
    if scene.pix is None:
        grid = jnp.broadcast_to(
            _pixel_grid(scene.hw)[None],
            (scene.n_imgs,) + (H * W, 2))
    else:
        grid = jnp.asarray(scene.pix, jnp.float32)
    pp_base = jnp.tile(jnp.asarray([[W / 2, H / 2]], jnp.float32),
                       (scene.n_imgs, 1))
    ei = jnp.asarray(scene.edges[:, 0], jnp.int32)
    ej = jnp.asarray(scene.edges[:, 1], jnp.int32)
    # log confidence weights (commons.py:49-50, cf='log' default)
    wi = jnp.log(jnp.maximum(scene.conf_i, 1.0 + 1e-6))
    wj = jnp.log(jnp.maximum(scene.conf_j, 1.0 + 1e-6))

    if schedule == "cosine":
        sched = optax.cosine_decay_schedule(lr, niter, alpha=lr_min / lr)
    elif schedule == "linear":
        sched = optax.linear_schedule(lr, lr_min, niter)
    else:
        raise ValueError(f"bad schedule {schedule!r}")
    tx = optax.adam(learning_rate=sched, b1=0.9, b2=0.9)

    def freeze_rows(x, mask):
        """Per-image stop_gradient — the requires_grad_(False) analogue for
        rows of a stacked param (modular_optimizer.py:70-71)."""
        if not mask.any():
            return x
        m = jnp.asarray(mask).reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, jax.lax.stop_gradient(x), x)

    def loss_fn(p):
        p = dict(
            p,
            im_poses=freeze_rows(p["im_poses"], pose_mask),
            focals_log=freeze_rows(p["focals_log"], focal_mask),
            depth_log=freeze_rows(p["depth_log"], depth_mask),
        )
        if not optimize_pp:
            p = dict(p, im_pp=jax.lax.stop_gradient(p["im_pp"]))
        else:
            p = dict(p, im_pp=freeze_rows(p["im_pp"], pp_mask))
        if not allow_pw_adaptors:
            p = dict(p, pw_adaptors=jax.lax.stop_gradient(p["pw_adaptors"]))
        return _scene_loss(p, scene, grid, pp_base, ei, ej, wi, wj, dist,
                           norm_pw=norm_pw)

    @jax.jit
    def run(params):
        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=niter)
        return params, losses

    params, losses = run(params)

    focals = jnp.exp(params["focals_log"] / FOCAL_BREAK)
    pp = pp_base + 10.0 * params["im_pp"]
    depth_flat = jnp.exp(params["depth_log"])  # (N, P)
    c2w = pose_vec_to_rt(params["im_poses"])
    rel = jnp.concatenate(
        [
            depth_flat[..., None] * (grid - pp[:, None])
            / focals[:, None, None],
            depth_flat[..., None],
        ],
        axis=-1,
    )
    world = jnp.einsum("nab,npb->npa", c2w[:, :3, :3], rel) + c2w[:, None, :3, 3]
    dense = scene.pix is None
    return {
        "poses": c2w,
        "focals": focals,
        "principal_points": pp,
        # dense scenes reshape to (N, H, W[, 3]); sparse keep (N, P[, 3])
        "depthmaps": depth_flat.reshape(scene.n_imgs, H, W)
        if dense else depth_flat,
        "pts3d": world.reshape(scene.n_imgs, H, W, 3)
        if dense else world,
        "losses": losses,
    }


def sparse_from_scene(scene: Scene, k: int = 1024) -> Scene:
    """Sparse-anchor view of a dense scene: keep the top-k most confident
    pixels per image and optimize only those.

    The compact counterpart of MASt3R's sparse global alignment
    (mast3r/cloud_opt/sparse_ga.py — anchor-point optimization instead of
    every pixel): per-image confidence is the max over every edge that
    observes the image (base_opt.py:135-141 semantics), anchors are its
    top-k pixels, and every per-edge map is gathered at the OWNING image's
    anchors (pred_i at image i's, pred_j at image j's — pred_j is laid out
    on image j's pixel grid). Cuts the optimized state and per-iteration
    cost by HW/k (~170x at 512-res with k=1024) at the price of sparse
    depth outputs."""
    assert scene.pix is None, "scene is already sparse"
    H, W = scene.hw
    n = scene.n_imgs
    conf_i = np.asarray(scene.conf_i)
    conf_j = np.asarray(scene.conf_j)
    im_conf = np.zeros((n, H * W), np.float32)
    for e, (i, j) in enumerate(scene.edges):
        im_conf[int(i)] = np.maximum(im_conf[int(i)], conf_i[e])
        im_conf[int(j)] = np.maximum(im_conf[int(j)], conf_j[e])
    k = min(k, H * W)

    # spatially-spread selection: top-confidence pixel per cell of a
    # ~sqrt(k)-wide grid (global top-k clusters on textured regions and
    # ill-conditions the pose fit — the grid spread mirrors sparse_ga's
    # subsample-grid anchors), then trim to k by confidence.
    G = int(math.ceil(math.sqrt(k)))
    ys, xs = np.divmod(np.arange(H * W), W)
    cell = (ys * G // H) * G + (xs * G // W)  # (HW,) in [0, G*G)
    anchors = np.zeros((n, k), np.int64)
    for im in range(n):
        order = np.argsort(-im_conf[im])  # best first
        first = np.full(G * G, -1, np.int64)
        seen = np.zeros(G * G, bool)
        for p in order:
            c = cell[p]
            if not seen[c]:
                seen[c] = True
                first[c] = p
        cand = first[first >= 0]
        cand = cand[np.argsort(-im_conf[im][cand])][:k]
        if len(cand) < k:  # fewer non-empty cells than k: fill by top conf
            cand_set = set(cand)
            extra = [p for p in order if p not in cand_set]
            cand = np.concatenate([cand, np.asarray(extra[: k - len(cand)])])
        anchors[im] = cand

    pred_i = np.asarray(scene.pred_i)
    pred_j = np.asarray(scene.pred_j)
    ei = scene.edges[:, 0].astype(int)
    ej = scene.edges[:, 1].astype(int)
    pix = np.stack([anchors % W, anchors // W], -1).astype(np.float32)
    return Scene(
        edges=scene.edges,
        pred_i=jnp.asarray(
            np.take_along_axis(pred_i, anchors[ei][..., None], axis=1)),
        pred_j=jnp.asarray(
            np.take_along_axis(pred_j, anchors[ej][..., None], axis=1)),
        conf_i=jnp.asarray(np.take_along_axis(conf_i, anchors[ei], axis=1)),
        conf_j=jnp.asarray(np.take_along_axis(conf_j, anchors[ej], axis=1)),
        hw=scene.hw, n_imgs=n, pix=pix,
    )


def scene_from_mast3r(
    teacher,
    params: dict,
    images: jnp.ndarray,
    pairs: Optional[Sequence[Tuple[int, int]]] = None,
    temperature: float = 1.0,
    dtype: Optional[str] = None,
    return_desc: bool = False,
):
    """Build a Scene by running the frozen MASt3R teacher over image pairs.

    images (N, H, W, 3) in [-1, 1] (MASt3R format, W >= H). pairs defaults
    to the complete symmetric graph (make_pairs scene_graph='complete',
    dust3r/image_pairs.py:11-29). One batched extract_features call covers
    all ordered pairs: edge (i, j) consumes pts3d_1 (img i in frame i) and
    pts3d_2_from_1 (img j in frame i) — the dust3r pred_i/pred_j
    convention the global aligner optimizes over.

    With return_desc, also returns the per-edge descriptor grids
    (desc_i, desc_j) — (E, H, W, D) — for reciprocal matching (the COLMAP
    database export needs discrete correspondences, not dense maps).
    """
    n = images.shape[0]
    if pairs is None:
        pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
    ii = jnp.asarray([p[0] for p in pairs])
    jj = jnp.asarray([p[1] for p in pairs])
    feats = teacher.extract_features(
        params, images[ii], images[jj], temperature, dtype=dtype)
    E = len(pairs)
    hw = tuple(images.shape[1:3])
    scene = Scene(
        edges=np.asarray(pairs, np.int32).reshape(E, 2),
        pred_i=feats["pts3d_1"].reshape(E, -1, 3),
        pred_j=feats["pts3d_2_from_1"].reshape(E, -1, 3),
        conf_i=feats["conf_1"].reshape(E, -1),
        conf_j=feats["conf_2"].reshape(E, -1),
        hw=hw, n_imgs=n,
    )
    if return_desc:
        return scene, np.asarray(feats["desc_1"]), np.asarray(feats["desc_2"])
    return scene


def align_pair(scene: Scene) -> Dict[str, np.ndarray]:
    """2-image fast path — PairViewer (pair_viewer.py:20-110): no
    optimization, poses from the most confident direction's Procrustes."""
    assert scene.n_imgs == 2
    assert scene.pix is None, (
        "align_pair returns dense (H, W) depthmaps — use global_align for "
        "sparse scenes")
    init = init_from_tree(scene)
    H, W = scene.hw
    return {
        "poses": init["poses"],
        "focals": init["focals"],
        "depthmaps": np.asarray(init["depth"]).reshape(2, H, W),
    }
