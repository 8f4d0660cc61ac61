"""MASt3R sparse global alignment — the TWO-STAGE flow.

Parity target: mast3r/cloud_opt/sparse_ga.py. `gd3d.align.sparse_from_scene`
is the compact anchor view of the DENSE aligner; THIS module is the
reference's distinct sparse-GA pipeline (sparse_global_alignment:119-156 +
sparse_scene_optimizer:159-553):

  1. symmetric pair inference + reciprocal correspondences,
  2. per-image CANONICAL pointmaps (conf-weighted average; 'avg-angle'
     relative-depth map, canonical_view :699-737), robust focal estimate,
  3. anchor grid: core depth at the subsample grid, every correspondence
     pixel attached to its block anchor by a depth RATIO
     (anchor_depth_offsets :740-768),
  4. a minimum spanning tree over pairwise matching scores (:991-1010)
     parameterizing cameras as a KINEMATIC CHAIN of relative poses, with
     the z_camera/global-scaling reparameterization (:236-283),
  5. stage 1 (coarse): Adam(betas=(0.9, 0.9)), cosine lr 0.2 -> 0, 3D
     matching loss gamma(1.1) over correspondence point pairs, poses and
     log-sizes only (:433-441),
  6. stage 2 (fine): lr 0.02, 2D reprojection loss gamma(0.4), focals +
     principal points + anchor depths unfrozen (:443-453),
     plus the DUSt3R-regression fallback (weight 0.01) on pairs whose
     matching confidence is too low (:305-325, matching_conf_thr).

TPU-first redesign: correspondences are condensed into fixed-size padded
(E, G) arrays with validity masks instead of python dicts of variable
slices; each optimization stage is ONE `lax.scan` jit (the reference steps
Adam from python under tqdm); the kinematic chain composes along the
static MST edge list inside the trace. Freeze/init of individual cameras
(:213-250) is not supported (the pipeline never uses it — the reference
itself asserts on the cam2w-init path).

Not ported: the optional lora_depth spectral projection (:404-406, off by
default) and exp_depth (off by default); depth_mode='add' (the default) is
the only mode.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gd3d.align import _estimate_focal
from gd3d.models.vggt.heads import quat_to_mat  # scalar-last (x, y, z, w)


# --------------------------------------------------------------- losses
def l1_dist(x, y):
    # value == |x-y| exactly; the double-where keeps the gradient finite
    # at coincident points (torch's .norm() NaNs there — degenerate input
    # only, e.g. an untrained teacher)
    d2 = jnp.sum(jnp.square(x - y), axis=-1)
    return jnp.where(d2 > 0, jnp.sqrt(jnp.maximum(d2, 1e-24)), 0.0)


def gamma_loss(gamma: float, mul: float = 1.0, offset: Optional[float] = None,
               clip: float = np.inf):
    """cloud_opt/utils/losses.py:19-28: (mul*|x-y| + o)^g - o^g with the
    unit-slope offset o = (1/g)^(1/(g-1))."""
    if offset is None:
        if gamma == 1:
            return l1_dist
        offset = (1 / gamma) ** (1 / (gamma - 1))

    def loss_func(x, y):
        return (mul * jnp.clip(l1_dist(x, y), max=clip) + offset) ** gamma \
            - offset ** gamma
    return loss_func


def cosine_schedule(alpha, lr_base, lr_end=0.0):
    return lr_end + (lr_base - lr_end) * (1 + np.cos(alpha * np.pi)) / 2


def linear_schedule(alpha, lr_base, lr_end=0.0):
    return (1 - alpha) * lr_base + alpha * lr_end


# ------------------------------------------------------ canonical views
def _pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, C*r*r, H/r, W/r), F.pixel_unshuffle layout."""
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // r, r, W // r, r)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(B, C * r * r, H // r, W // r)


def _pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    B, C, H, W = x.shape
    x = x.reshape(B, C // (r * r), r, r, H, W)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(B, C // (r * r), H * r, W * r)


def canonical_view(ptmaps11: jnp.ndarray, confs11: jnp.ndarray,
                   subsample: int, mode: str = "avg-angle"):
    """Canonical pointmap of one image from its n pairwise predictions
    (sparse_ga.py:699-737). ptmaps11 (n, H, W, 3), confs11 (n, H, W).
    Returns (canon (H, W, 3), canon2 (H, W) relative depth, cconf (H, W))."""
    confs = confs11[..., None] - 0.999
    canon = (confs * ptmaps11).sum(0) / confs.sum(0)

    canon_depth = ptmaps11[..., 2][:, None]  # (n, 1, H, W)
    s0 = subsample // 2
    center_depth = canon_depth[:, :, s0::subsample, s0::subsample]
    center_depth = jnp.clip(center_depth,
                            min=float(np.finfo(np.float32).eps))

    stacked_depth = _pixel_unshuffle(canon_depth, subsample)
    stacked_confs = _pixel_unshuffle(confs[:, None, :, :, 0], subsample)

    if mode == "avg-reldepth":
        rel = stacked_depth / center_depth
        stacked_canon = (stacked_confs * rel).sum(0) / stacked_confs.sum(0)
        canon2 = _pixel_shuffle(stacked_canon[None], subsample)[0, 0]
    elif mode == "avg-angle":
        xy = ptmaps11[..., 0:2].transpose(0, 3, 1, 2)  # (n, 2, H, W)
        stacked_xy = _pixel_unshuffle(xy, subsample)
        n, _, H2, W2 = stacked_xy.shape
        radius = jnp.linalg.norm(
            stacked_xy.reshape(n, 2, -1, H2, W2)
            - xy[:, :, None, s0::subsample, s0::subsample], axis=1)
        radius = jnp.clip(radius, min=1e-8)
        angle = jnp.arctan((stacked_depth - center_depth) / radius)
        avg_angle = (stacked_confs * angle).sum(0) / stacked_confs.sum(0)
        depth2 = radius.mean(0) * jnp.tan(avg_angle)
        canon2 = _pixel_shuffle(
            (1 + depth2 / canon[s0::subsample, s0::subsample, 2])[None],
            subsample)[0, 0]
    else:
        raise ValueError(f"bad {mode=}")

    cconf = ((confs ** 2).sum(0) / confs.sum(0))[..., 0]
    return canon, canon2, cconf


def anchor_depth_offsets(canon2: np.ndarray, pix_xy: np.ndarray,
                         subsample: int):
    """Attach pixels to their block anchor (sparse_ga.py:740-768).
    pix_xy (M, 2) int pixel coords -> (core flat idx (M,), depth-ratio
    offsets (M,)) on the (H/sub, W/sub) anchor grid."""
    H1, W1 = canon2.shape
    W2 = int(math.ceil((W1 - subsample // 2) / subsample))
    px, py = np.asarray(pix_xy, np.int64).T
    core_idx = (py // subsample) * W2 + (px // subsample)
    s0 = subsample // 2
    core_depth = np.asarray(canon2)[s0::subsample, s0::subsample].reshape(-1)
    ref_z = core_depth[core_idx]
    pts_z = np.asarray(canon2)[py, px]
    return core_idx, pts_z / ref_z


def compute_min_spanning_tree(scores: np.ndarray):
    """MST over pairwise scores, rooted at the most central node
    (sparse_ga.py:991-1010: double-BFS midpoint), edges parent->child in
    BFS order."""
    from scipy import sparse as sp

    g = sp.dok_array(scores.shape)
    for i, j in zip(*np.nonzero(scores)):
        g[i, j] = -float(scores[i, j])
    msp = sp.csgraph.minimum_spanning_tree(g)

    def bfs_ranks(start):
        # ranks[node] = BFS VISITATION index (sparse_ga.py:984-988), NOT
        # hop depth — the double-BFS midpoint differs on branching trees
        order, _ = sp.csgraph.breadth_first_order(
            msp, start, directed=False)
        ranks = np.arange(len(order))
        ranks[order] = ranks.copy()
        return ranks

    r1 = bfs_ranks(0)
    r2 = bfs_ranks(int(r1.argmax()))
    r1 = bfs_ranks(int(r2.argmax()))
    root = int(np.minimum(r1, r2).argmax())
    order, preds = sp.csgraph.breadth_first_order(msp, root, directed=False)
    edges = [(int(preds[i]), int(i)) for i in order[1:]]
    return root, edges


# ----------------------------------------------------------- scene data
@dataclasses.dataclass(frozen=True)
class SparseScene:
    """Condensed fixed-shape sparse-GA problem (condense_data rebuilt as
    padded arrays; A = anchor-grid size, E edges, G correspondence slots)."""

    hw: Tuple[int, int]
    n_imgs: int
    subsample: int
    pps: np.ndarray            # (N, 2) principal points, px
    base_focals: np.ndarray    # (N,)
    core_depth0: np.ndarray    # (N, A) canonical depth at anchors
    canon2: np.ndarray         # (N, H, W) relative-depth maps (densify)
    e_i: np.ndarray            # (E,)
    e_j: np.ndarray            # (E,)
    pix_i: np.ndarray          # (E, G, 2)
    pix_j: np.ndarray          # (E, G, 2)
    conf: np.ndarray           # (E, G)
    valid: np.ndarray          # (E, G) bool
    aidx_i: np.ndarray         # (E, G) anchor index in image e_i
    aidx_j: np.ndarray         # (E, G)
    off_i: np.ndarray          # (E, G) depth-ratio offsets
    off_j: np.ndarray          # (E, G)
    d_pts: np.ndarray          # (E, G, 3) img-j points in img-i's frame
    d_conf: np.ndarray         # (E, G) their confidence
    matching_ok: np.ndarray    # (E,) bool — conf.max() > matching_conf_thr
    mst_root: int
    mst_edges: Tuple[Tuple[int, int], ...]

    @property
    def grid_hw(self) -> Tuple[int, int]:
        H, W = self.hw
        s = self.subsample
        return (int(math.ceil((H - s // 2) / s)),
                int(math.ceil((W - s // 2) / s)))


def build_scene(hw, ptmaps, confs, pts_in_other, confs_other, corres,
                subsample: int = 8, matching_conf_thr: float = 5.0,
                mode: str = "avg-angle") -> SparseScene:
    """Pure-data constructor (the teacher-free entry the tests use).

    ptmaps[i]: list of (H, W, 3) predictions of image i in ITS OWN frame
      (one per pair observing i); confs[i]: matching (H, W) conf maps.
    pts_in_other[(i, j)]: (H, W, 3) image J's points in image I's frame
      (the X21 of the symmetric inference) with confs_other[(i, j)] — the
      DUSt3R-regression fallback target (the reference uses the mirrored
      X12/preds_21 tensor with the i/j roles exchanged; same formulation).
    corres[(i, j)]: (xy_i (M, 2), xy_j (M, 2), conf (M,)) reciprocal
      correspondences for the unordered pair i < j.
    """
    H, W = hw
    n = len(ptmaps)
    pairs = sorted(corres.keys())
    E = len(pairs)
    G = max(len(corres[p][2]) for p in pairs)

    canon = np.zeros((n, H, W, 3), np.float32)
    canon2 = np.zeros((n, H, W), np.float32)
    s0 = subsample // 2
    core_depth0 = []
    base_focals = np.zeros(n, np.float32)
    pps = np.tile(np.float32([W / 2, H / 2]), (n, 1))
    for i in range(n):
        c, c2, _ = canonical_view(
            jnp.asarray(np.stack(ptmaps[i])),
            jnp.asarray(np.stack(confs[i])), subsample, mode)
        canon[i] = np.asarray(c)
        canon2[i] = np.asarray(c2)
        # Guards below only bite on degenerate input (e.g. an untrained
        # teacher, whose 'exp'-mode pointmaps can have NEGATIVE z): a
        # trained MASt3R predicts forward points, and the reference NaNs
        # on such input anyway (log of a negative focal estimate,
        # sparse_ga.py:224). Clamp focal to the optimizer's own floor and
        # anchor depths to a tiny positive value.
        diag = float(np.hypot(H, W))
        base_focals[i] = np.clip(
            _estimate_focal(canon[i], (H, W)), 0.25 * diag, 10.0 * diag)
        core_depth0.append(np.clip(
            canon[i, s0::subsample, s0::subsample, 2].reshape(-1),
            1e-6, None))
    core_depth0 = np.stack(core_depth0)

    e_i = np.array([p[0] for p in pairs], np.int32)
    e_j = np.array([p[1] for p in pairs], np.int32)
    pix_i = np.zeros((E, G, 2), np.float32)
    pix_j = np.zeros((E, G, 2), np.float32)
    conf = np.zeros((E, G), np.float32)
    valid = np.zeros((E, G), bool)
    aidx_i = np.zeros((E, G), np.int64)
    aidx_j = np.zeros((E, G), np.int64)
    off_i = np.ones((E, G), np.float32)
    off_j = np.ones((E, G), np.float32)
    d_pts = np.zeros((E, G, 3), np.float32)
    d_conf = np.zeros((E, G), np.float32)
    scores = np.zeros((n, n), np.float32)

    for e, (i, j) in enumerate(pairs):
        xy_i, xy_j, cf = (np.asarray(a) for a in corres[(i, j)])
        m = len(cf)
        pix_i[e, :m] = xy_i
        pix_j[e, :m] = xy_j
        conf[e, :m] = cf
        valid[e, :m] = True
        aidx_i[e, :m], off_i[e, :m] = anchor_depth_offsets(
            canon2[i], xy_i, subsample)
        aidx_j[e, :m], off_j[e, :m] = anchor_depth_offsets(
            canon2[j], xy_j, subsample)
        # DUSt3R-regression fallback data: image j's points in i's frame,
        # sampled at j's correspondence anchors (condense_data:84-90 with
        # the i/j roles exchanged — see the build_scene docstring)
        pred_ji = np.asarray(pts_in_other[(i, j)])
        conf_ji = np.asarray(confs_other[(i, j)])
        grid_pts = pred_ji[s0::subsample, s0::subsample].reshape(-1, 3)
        grid_cf = conf_ji[s0::subsample, s0::subsample].reshape(-1)
        d_pts[e, :m] = grid_pts[aidx_j[e, :m]]
        d_conf[e, :m] = grid_cf[aidx_j[e, :m]]
        scores[i, j] = scores[j, i] = m  # matching_score[2] (:545)

    matching_ok = np.array(
        [conf[e][valid[e]].max(initial=0.0) > matching_conf_thr
         for e in range(E)])
    root, edges = compute_min_spanning_tree(scores)
    return SparseScene(
        hw=hw, n_imgs=n, subsample=subsample, pps=pps,
        base_focals=base_focals, core_depth0=core_depth0, canon2=canon2,
        e_i=e_i, e_j=e_j, pix_i=pix_i, pix_j=pix_j, conf=conf, valid=valid,
        aidx_i=aidx_i, aidx_j=aidx_j, off_i=off_i, off_j=off_j,
        d_pts=d_pts, d_conf=d_conf, matching_ok=matching_ok,
        mst_root=root, mst_edges=tuple(edges),
    )


def build_scene_from_mast3r(teacher, params, images,
                            pairs: Optional[Sequence[Tuple[int, int]]] = None,
                            subsample: int = 8,
                            matching_conf_thr: float = 5.0,
                            temperature: float = 1.0,
                            dtype: Optional[str] = None,
                            max_corres: int = 1024,
                            pair_chunk: int = 8) -> SparseScene:
    """Frozen-teacher entry: symmetric inference over every unordered pair
    (forward_mast3r :524-553) + reciprocal-NN correspondences.

    Correspondence confidence uses the matching conf maps at the matched
    pixels (sqrt of the two sides) — the reference scores with desc_conf
    (extract_correspondences); both are percentile-comparable confidences,
    and matching_conf_thr applies the same gate.

    Pairs run through the teacher in `pair_chunk`-sized batches: the full
    complete graph is n(n-1)/2 pairs and a single batched ViT-L forward
    over all of them would scale activation HBM O(n^2) (the reference
    streams one pair at a time with a disk cache, forward_mast3r
    :524-531); chunks keep one compiled program (static batch) at bounded
    memory.
    """
    from gd3d.distill.keypoints import filter_and_match_keypoints

    n = images.shape[0]
    H, W = int(images.shape[1]), int(images.shape[2])
    if pairs is None:
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    ii = np.asarray([p[0] for p in pairs])
    jj = np.asarray([p[1] for p in pairs])
    E = len(pairs)
    chunk = max(1, min(pair_chunk, E))
    feat_chunks = []
    for s0 in range(0, E, chunk):
        sel = np.arange(s0, min(s0 + chunk, E))
        # pad the tail to the chunk size so every dispatch reuses ONE
        # compiled program; padded outputs are sliced away
        pad = np.concatenate([sel, np.zeros(chunk - len(sel), np.int64)])
        f = teacher.extract_features(
            params, images[jnp.asarray(ii[pad])],
            images[jnp.asarray(jj[pad])], temperature, dtype=dtype)
        feat_chunks.append(
            {k: np.asarray(v[:len(sel)]) for k, v in f.items()})
    feats = {k: np.concatenate([c[k] for c in feat_chunks])
             for k in feat_chunks[0]}

    ptmaps = [[] for _ in range(n)]
    confs = [[] for _ in range(n)]
    pts_in_other: Dict[Tuple[int, int], np.ndarray] = {}
    confs_other: Dict[Tuple[int, int], np.ndarray] = {}
    corres = {}
    for e, (i, j) in enumerate(pairs):
        p1 = np.asarray(feats["pts3d_1"][e])
        p2 = np.asarray(feats["pts3d_2"][e])
        c1 = np.asarray(feats["conf_1"][e])
        c2 = np.asarray(feats["conf_2"][e])
        ptmaps[i].append(p1)
        confs[i].append(c1)
        ptmaps[j].append(p2)
        confs[j].append(c2)
        # X21: j's points in i's frame (the fallback target); its exact
        # confidence map (C21) is not exported by extract_features, so
        # C22 stands in — same image, same confidence scale
        pts_in_other[(i, j)] = np.asarray(feats["pts3d_2_from_1"][e])
        confs_other[(i, j)] = np.asarray(feats["conf_2"][e])

        kp1, kp2, valid = filter_and_match_keypoints(
            {"desc_1": feats["desc_1"][e], "desc_2": feats["desc_2"][e],
             "conf_1": feats["conf_1"][e], "conf_2": feats["conf_2"][e]},
            H, W, subsample=subsample, border=0, min_conf_percent=0.0)
        v = np.asarray(valid)
        kp1 = np.asarray(kp1)[v][:max_corres]
        kp2 = np.asarray(kp2)[v][:max_corres]
        x1, y1 = kp1[:, 0].astype(int), kp1[:, 1].astype(int)
        x2, y2 = kp2[:, 0].astype(int), kp2[:, 1].astype(int)
        cf = np.sqrt(c1[y1, x1] * c2[y2, x2])
        corres[(i, j)] = (kp1, kp2, cf)

    return build_scene((H, W), ptmaps, confs, pts_in_other, confs_other,
                       corres, subsample, matching_conf_thr)


# -------------------------------------------------------- the optimizer
def _make_K_cam_depth(params, scene: SparseScene, median_depths,
                      min_focals, max_focals, with_extr: bool = True):
    """sparse_scene_optimizer's make_K_cam_depth (:236-283): intrinsics,
    kinematic-chain cam2w with the z_camera reparameterization, and the
    'add'-mode anchor depthmaps under the global scaling."""
    N = scene.n_imgs
    focals = jnp.clip(jnp.exp(params["log_focals"]),
                      min=min_focals, max=max_focals)
    K = jnp.zeros((N, 3, 3)).at[:, 2, 2].set(1.0)
    K = K.at[:, 0, 0].set(focals).at[:, 1, 1].set(focals)
    imsizes = jnp.float32([scene.hw[1], scene.hw[0]])
    K = K.at[:, 0:2, 2].set(params["pps"] * imsizes)
    if not with_extr:
        return K

    sizes = jnp.exp(params["log_sizes"])
    global_scaling = 1.0 / sizes.min()
    base_focals = jnp.asarray(scene.base_focals)
    z_cameras = sizes * median_depths * focals / base_focals

    q = params["quats"]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    rel = jnp.tile(jnp.eye(4), (N, 1, 1))
    rel = rel.at[:, :3, :3].set(quat_to_mat(q))
    rel = rel.at[:, :3, 3].set(params["trans"])

    # kinematic chain along the (static) MST
    cams: List = [None] * N
    cams[scene.mst_root] = rel[scene.mst_root]
    for i, j in scene.mst_edges:
        cams[j] = cams[i] @ rel[j]
    tmp = jnp.stack(cams)

    ones = jnp.ones((N, 1))
    trans_offset = z_cameras[:, None] * jnp.concatenate(
        [imsizes / focals[:, None] * (0.5 - params["pps"]), ones], axis=-1)
    new_trans = global_scaling * (
        tmp[:, :3, 3:4] - tmp[:, :3, :3] @ trans_offset[:, :, None])
    cam2w = jnp.concatenate(
        [jnp.concatenate([tmp[:, :3, :3], new_trans], axis=2),
         jnp.tile(jnp.float32([[[0, 0, 0, 1]]]), (N, 1, 1))], axis=1)
    w2cam = jnp.linalg.inv(cam2w)

    # depth_mode='add' (:262-270)
    depth = (z_cameras[:, None]
             + (params["core_depth"] - 1.0)
             * (median_depths * sizes)[:, None]) * global_scaling
    return K, (w2cam, cam2w), depth, focals


def _corres_pts3d(scene, K, cam2w, depth, focals):
    """3D points of every (edge, slot) correspondence on BOTH sides
    (make_pts3d :478-506 incl. the focal compensation of the offsets)."""
    base = jnp.asarray(scene.base_focals)

    def side(e_im, pix, aidx, off):
        im = jnp.asarray(e_im)               # (E,)
        offc = 1.0 + (jnp.asarray(off) - 1.0) * (base[im] / focals[im])[:, None]
        z = depth[im[:, None], jnp.asarray(aidx)] * offc  # (E, G)
        Ke = K[im]                            # (E, 3, 3)
        fx = Ke[:, 0, 0][:, None]
        fy = Ke[:, 1, 1][:, None]
        cx = Ke[:, 0, 2][:, None]
        cy = Ke[:, 1, 2][:, None]
        px = jnp.asarray(pix)[..., 0]
        py = jnp.asarray(pix)[..., 1]
        pts = jnp.stack([(px - cx) / fx * z, (py - cy) / fy * z, z], -1)
        R = cam2w[im][:, None, :3, :3]
        t = cam2w[im][:, None, :3, 3]
        return jnp.einsum("egab,egb->ega", R, pts) + t

    pts_i = side(scene.e_i, scene.pix_i, scene.aidx_i, scene.off_i)
    pts_j = side(scene.e_j, scene.pix_j, scene.aidx_j, scene.off_j)
    return pts_i, pts_j


def _losses(params, scene, median_depths, min_focals, max_focals,
            stage: str, gamma3d, gamma2d, gammad, loss_dust3r_w):
    K, (w2cam, cam2w), depth, focals = _make_K_cam_depth(
        params, scene, median_depths, min_focals, max_focals)
    pts_i, pts_j = _corres_pts3d(scene, K, cam2w, depth, focals)

    conf = jnp.asarray(scene.conf)
    ok3d = (jnp.asarray(scene.valid)
            & jnp.asarray(scene.matching_ok)[:, None]).astype(jnp.float32)
    w = conf * ok3d

    if stage == "coarse":
        # loss_3d (:345-372): conf-weighted 3D distance between the two
        # sides of each correspondence
        num = jnp.sum(w * gamma3d(pts_i, pts_j))
        den = jnp.maximum(jnp.sum(w), 1e-8)
        main = num / den
    else:
        # loss_2d (:374-392): conf-weighted pixel reprojection error,
        # both directions
        def reproj(e_im, pts):
            # reproj2d (:976-981): z floor 1e-3, uv clip [-1000, 2000]
            im = jnp.asarray(e_im)
            P = jnp.einsum("eab,ebc->eac", K[im], w2cam[im][:, :3])
            h = jnp.einsum("eab,egb->ega",
                           P, jnp.concatenate(
                               [pts, jnp.ones_like(pts[..., :1])], -1))
            uv = h[..., :2] / jnp.clip(h[..., 2:], min=1e-3)
            return jnp.clip(uv, min=-1000.0, max=2000.0)

        err_i = gamma2d(jnp.asarray(scene.pix_i),
                        reproj(scene.e_i, pts_j))
        err_j = gamma2d(jnp.asarray(scene.pix_j),
                        reproj(scene.e_j, pts_i))
        num = jnp.sum(w * (err_i + err_j))
        den = jnp.maximum(jnp.sum(w) * 2.0, 1e-8)
        main = num / den

    # DUSt3R fallback on low-matching pairs (:305-325): image j's sparse
    # points vs its prediction from i's frame brought to world by cam2w[i]
    # (roles exchanged vs the reference — see build_scene)
    bad = (jnp.asarray(scene.valid)
           & ~jnp.asarray(scene.matching_ok)[:, None]).astype(jnp.float32)
    dw = jnp.asarray(scene.d_conf) * bad
    R = cam2w[jnp.asarray(scene.e_i)][:, None, :3, :3]
    t = cam2w[jnp.asarray(scene.e_i)][:, None, :3, 3]
    tgt = jnp.einsum("egab,egb->ega", R, jnp.asarray(scene.d_pts)) + t
    dnum = jnp.sum(dw * gammad(pts_j, tgt))
    dden = jnp.sum(dw)
    loss_d = jnp.where(dden > 0, dnum / jnp.maximum(dden, 1e-8), 0.0)
    return main + loss_dust3r_w * loss_d


def sparse_scene_optimizer(
    scene: SparseScene,
    lr1: float = 0.2, niter1: int = 500, gamma1: float = 1.1,
    lr2: float = 0.02, niter2: int = 500, gamma2: float = 0.4,
    gammad: float = 1.1,
    opt_pp: bool = True, opt_depth: bool = True,
    loss_dust3r_w: float = 0.01,
) -> Dict[str, np.ndarray]:
    """Two-stage optimization (:433-453). Returns intrinsics, cam2w,
    anchor depthmaps and the per-correspondence sparse 3D points."""
    N = scene.n_imgs
    core0 = jnp.asarray(scene.core_depth0)
    # torch .median() = LOWER-middle element on even counts (the anchor
    # grid is almost always even, e.g. 64x48=3072); jnp.median would
    # average the two middle values and shift z_cameras on every run
    A = core0.shape[1]
    median_depths = jnp.sort(core0, axis=1)[:, (A - 1) // 2]
    imsizes = np.float32([scene.hw[1], scene.hw[0]])
    diag = float(np.linalg.norm(imsizes))
    min_focals, max_focals = 0.25 * diag, 10.0 * diag

    params = {
        "quats": jnp.tile(jnp.float32([0, 0, 0, 1]), (N, 1)),
        "trans": jnp.zeros((N, 3)),
        "log_sizes": jnp.zeros((N,)),
        "pps": jnp.asarray(scene.pps / imsizes),  # normalized, (0.5, 0.5)
        "log_focals": jnp.log(jnp.asarray(scene.base_focals)),
        "core_depth": core0 / median_depths[:, None],
    }
    g3 = gamma_loss(gamma1)
    g2 = gamma_loss(gamma2)
    gd = gamma_loss(gammad)

    def run_stage(params, stage, lr_base, niter, train_keys):
        if niter == 0:
            return params
        lr_fn = optax.cosine_decay_schedule(lr_base, max(niter, 1))
        tx = optax.adam(lr_fn, b1=0.9, b2=0.9)  # reference betas (:396)
        opt_state = tx.init(params)

        def loss_fn(p):
            return _losses(p, scene, median_depths, min_focals, max_focals,
                           stage, g3, g2, gd, loss_dust3r_w)

        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            grads = {k: (v if k in train_keys else jnp.zeros_like(v))
                     for k, v in grads.items()}
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            # keep the pose well optimizable (:416-417)
            p["quats"] = p["quats"] / jnp.linalg.norm(
                p["quats"], axis=-1, keepdims=True)
            return (p, s), loss

        (params, _), losses = jax.lax.scan(
            body, (params, opt_state), None, length=niter)
        return params

    stage1_keys = {"quats", "trans", "log_sizes"}
    stage2_keys = set(stage1_keys) | {"log_focals"}
    if opt_pp:
        stage2_keys.add("pps")
    if opt_depth:
        stage2_keys.add("core_depth")

    run = jax.jit(run_stage,
                  static_argnames=("stage", "lr_base", "niter",
                                   "train_keys"))

    def snapshot(p):
        K, (w2cam, cam2w), depth, focals = _make_K_cam_depth(
            p, scene, median_depths, min_focals, max_focals)
        pts_i, pts_j = _corres_pts3d(scene, K, cam2w, depth, focals)
        return {
            "intrinsics": np.asarray(K),
            "cam2w": np.asarray(cam2w),
            "depthmaps": np.asarray(depth),
            "pts3d_i": np.asarray(pts_i),
            "pts3d_j": np.asarray(pts_j),
        }

    params = run(params, "coarse", lr1, niter1,
                 frozenset(stage1_keys))
    res_coarse = snapshot(params)
    res_fine = None
    if niter2:
        params = run(params, "fine", lr2, niter2,
                     frozenset(stage2_keys))
        res_fine = snapshot(params)
    return {"coarse": res_coarse, "fine": res_fine}


def dense_pts3d(scene: SparseScene, res: Dict[str, np.ndarray]):
    """Densify the optimized anchor depths to full-resolution pointmaps via
    the canonical relative-depth offsets (get_dense_pts3d :71-95)."""
    H, W = scene.hw
    pix = np.stack(np.meshgrid(np.arange(W), np.arange(H)), -1).reshape(-1, 2)
    out_pts, out_depth = [], []
    for i in range(scene.n_imgs):
        idx, off = anchor_depth_offsets(scene.canon2[i], pix,
                                        scene.subsample)
        K = res["intrinsics"][i]
        focal = K[0, 0]
        offc = 1.0 + (off - 1.0) * (scene.base_focals[i] / focal)
        z = res["depthmaps"][i][idx] * offc
        x = (pix[:, 0] - K[0, 2]) / K[0, 0] * z
        y = (pix[:, 1] - K[1, 2]) / K[1, 1] * z
        pts = np.stack([x, y, z], -1)
        cam2w = res["cam2w"][i]
        out_pts.append(pts @ cam2w[:3, :3].T + cam2w[:3, 3])
        out_depth.append(z.reshape(H, W))
    return out_pts, out_depth


def sparse_global_alignment(teacher, params, images, pairs=None,
                            subsample: int = 8,
                            matching_conf_thr: float = 5.0,
                            temperature: float = 1.0,
                            dtype: Optional[str] = None,
                            **opt_kw):
    """End-to-end: frozen MASt3R -> SparseScene -> two-stage optimization
    (sparse_global_alignment :119-156)."""
    scene = build_scene_from_mast3r(
        teacher, params, images, pairs, subsample, matching_conf_thr,
        temperature, dtype)
    res = sparse_scene_optimizer(scene, **opt_kw)
    return scene, res
