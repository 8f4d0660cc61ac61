"""Loss parity tests against direct numpy/torch transcriptions of the
reference formulas (utils/losses.py, src/finetune_timm_mast3r.py:556-589,
src/finetune_timm_me.py:199-217)."""
import jax.numpy as jnp
import numpy as np

from gd3d.ops import (
    kl_divergence_map,
    pairwise_logistic_ranking_loss,
    ap_loss_paired,
    ap_loss_me,
)


def np_sigmoid(x, temp):
    return 1.0 / (1.0 + np.exp(np.clip(-x / temp, -50, 50)))


def test_kl_divergence_map():
    rng = np.random.RandomState(0)
    p = np.abs(rng.rand(2, 6, 6)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    q = np.abs(rng.rand(2, 6, 6)).astype(np.float32)
    q /= q.sum(-1, keepdims=True)
    eps = 1e-8
    pc, qc = np.maximum(p, eps), np.maximum(q, eps)
    want = (pc * np.log(pc / qc)).sum(-1).mean()
    got = float(kl_divergence_map(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kl_divergence_handles_zero_rows():
    p = np.zeros((1, 4, 4), np.float32)
    q = np.full((1, 4, 4), 0.25, np.float32)
    got = float(kl_divergence_map(jnp.asarray(p), jnp.asarray(q)))
    eps = 1e-8
    want = (eps * np.log(eps / 0.25)) * 4
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pairwise_logistic_ranking():
    rng = np.random.RandomState(3)
    B, N = 1, 12
    score_diff = rng.randn(B, N, N).astype(np.float32) * 0.5
    depths = rng.rand(B, N).astype(np.float32)
    thr = 0.05

    # numpy loop transcription of utils/losses.py:18-41
    losses = []
    for b in range(B):
        for i in range(N):
            for j in range(N):
                dj, di = depths[b, j], depths[b, i]
                if abs(dj - di) > thr:
                    alpha = np.sign(dj - di)
                    losses.append(np.log1p(np.exp(-alpha * score_diff[b, i, j])))
    want = np.mean(losses)
    got = float(
        pairwise_logistic_ranking_loss(
            jnp.asarray(score_diff), jnp.asarray(depths), depth_threshold=thr
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pairwise_logistic_ranking_empty_is_zero():
    score = jnp.zeros((1, 4, 4))
    depths = jnp.ones((1, 4))  # no pair exceeds the threshold
    got = float(pairwise_logistic_ranking_loss(score, depths, 0.05))
    assert got == 0.0


def ap_paired_numpy(desc1, desc2, p1, p2, thr, temp, legacy_rpos1=False):
    # transcription of src/finetune_timm_mast3r.py:556-589; with
    # legacy_rpos1, of finetune_timm_vggt.py:550-585 (its ap1 kept the
    # pre-correction sigmoid(1-pos_sim) rpos)
    B, N, _ = desc1.shape
    assert B == 1
    sim = desc1[0] @ desc2[0].T
    dist = np.linalg.norm(p1[0][:, None] - p2[0][None, :], axis=-1)
    eye = np.eye(N, dtype=bool)
    neg = (dist > thr) & ~eye
    pos_sim = np.diag(sim)
    if legacy_rpos1:
        rpos = np_sigmoid(1.0 - pos_sim, temp) + 1
    else:
        rpos = np_sigmoid(pos_sim - 1.0, temp) + 1
    rall = rpos + (np_sigmoid(sim - 1.0, temp) * neg).sum(-1)
    ap1 = rpos / rall
    rpos = np_sigmoid(1.0 - pos_sim, temp) + 1
    rall = rpos + (np_sigmoid(sim - pos_sim[:, None], temp) * neg).sum(-1)
    ap2 = rpos / rall
    return np.mean(1.0 - (ap1 + ap2) / 2)


def test_ap_loss_paired_matches_reference():
    rng = np.random.RandomState(4)
    N = 24
    d1 = rng.randn(1, N, 8).astype(np.float32)
    d2 = rng.randn(1, N, 8).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    p1 = rng.rand(1, N, 3).astype(np.float32)
    p2 = rng.rand(1, N, 3).astype(np.float32)
    want = ap_paired_numpy(d1, d2, p1, p2, 0.1, 0.01)
    got = float(
        ap_loss_paired(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(p1), jnp.asarray(p2)
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-4)
    # VGGT variant: ap1 keeps the pre-correction rpos (vggt.py:556);
    # must match its own transcription at the reference temp
    want_l = ap_paired_numpy(d1, d2, p1, p2, 0.1, 0.01, legacy_rpos1=True)
    got_l = float(ap_loss_paired(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(p1), jnp.asarray(p2),
        legacy_rpos1=True))
    np.testing.assert_allclose(got_l, want_l, rtol=5e-4)
    # at temp=0.01 both sigmoids saturate on random descriptors; assert
    # the formulas actually diverge at a soft temperature
    soft = float(ap_loss_paired(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(p1), jnp.asarray(p2),
        temp=1.0))
    soft_l = float(ap_loss_paired(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(p1), jnp.asarray(p2),
        temp=1.0, legacy_rpos1=True))
    assert abs(soft - soft_l) > 1e-4
    np.testing.assert_allclose(
        soft_l, ap_paired_numpy(d1, d2, p1, p2, 0.1, 1.0, legacy_rpos1=True),
        rtol=5e-4)


def test_ap_loss_paired_padding_invariance():
    """Padding with invalid slots must not change the loss."""
    rng = np.random.RandomState(5)
    N, P = 16, 8
    d1 = rng.randn(1, N, 8).astype(np.float32)
    d2 = rng.randn(1, N, 8).astype(np.float32)
    p1 = rng.rand(1, N, 3).astype(np.float32)
    p2 = rng.rand(1, N, 3).astype(np.float32)
    base = float(
        ap_loss_paired(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(p1), jnp.asarray(p2),
            valid=jnp.ones((1, N), bool),
        )
    )
    pad = lambda x: np.concatenate([x, rng.randn(1, P, x.shape[-1]).astype(np.float32)], 1)
    valid = jnp.asarray(np.concatenate([np.ones((1, N)), np.zeros((1, P))], 1).astype(bool))
    padded = float(
        ap_loss_paired(
            jnp.asarray(pad(d1)), jnp.asarray(pad(d2)),
            jnp.asarray(pad(p1)), jnp.asarray(pad(p2)), valid=valid,
        )
    )
    np.testing.assert_allclose(padded, base, rtol=1e-5)


def ap_me_numpy(d1, d2, p1, p2, pos_thr, neg_thr, temp):
    # transcription of src/finetune_timm_me.py:199-217
    sim = d1[0] @ d2[0].T  # S x T
    dist = np.linalg.norm(p1[0][:, None] - p2[0][None, :], axis=-1)
    pos = np.argwhere(dist < pos_thr)
    if len(pos) == 0:
        return 0.0
    aps = []
    for i, j in pos:
        pos_sim = sim[i, j]
        neg = dist[i] > neg_thr
        rpos = np_sigmoid(pos_sim - 1.0, temp) + 1
        rall = rpos + (np_sigmoid(sim[i] - 1.0, temp) * neg).sum()
        ap1 = rpos / rall
        rpos = np_sigmoid(1.0 - pos_sim, temp) + 1
        rall = rpos + (np_sigmoid(sim[i] - pos_sim, temp) * neg).sum()
        ap2 = rpos / rall
        aps.append((ap1 + ap2) / 2)
    return np.mean(1.0 - np.array(aps))


def test_ap_loss_me_matches_reference():
    rng = np.random.RandomState(6)
    S, T = 20, 18
    d1 = rng.randn(1, S, 8).astype(np.float32)
    d2 = rng.randn(1, T, 8).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    # 3D points with some close pairs (positives)
    p1 = rng.rand(1, S, 3).astype(np.float32) * 0.3
    p2 = p1[:, :T] + rng.randn(1, T, 3).astype(np.float32) * 0.01
    want = ap_me_numpy(d1, d2, p1, p2, 5e-3, 0.1, 0.01)
    got = float(
        ap_loss_me(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(p1), jnp.asarray(p2)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_intra_depth_margin_loss():
    """Margin variant (utils/losses.py:44-69) vs numpy loop."""
    from gd3d.ops import intra_depth_margin_loss

    rng = np.random.RandomState(7)
    B, N = 1, 8
    pred = rng.randn(B, N, N).astype(np.float32) * 0.3
    depths = rng.rand(B, N).astype(np.float32)
    margin, thr = 0.05, 0.05
    losses = []
    for i in range(N):
        for j in range(N):
            gt = np.tanh(depths[0, i] - depths[0, j])
            if abs(gt) > thr:
                losses.append(max(0.0, margin - np.sign(gt) * pred[0, i, j]))
    want = np.mean(losses)
    got = float(
        intra_depth_margin_loss(
            jnp.asarray(pred), jnp.asarray(depths), margin, thr
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)
