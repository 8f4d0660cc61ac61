"""MASt3R pretraining matching-criterion parity: gd3d/ops/matching_loss.py
vs the reference's ACTUAL mast3r.losses classes (InfoNCE modes, true-AP
scores, MatchingLoss gather, ConfMatchingLoss). Slow tier (imports the
reference torch stack)."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REF = "/root/reference"


def _ref_paths():
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    for p in (f"{REF}/dust3r", f"{REF}/dust3r/croco", REF):
        if p not in sys.path:
            sys.path.append(p)


def _rand_descs(seed=0, B=2, N=24, D=16, M=None):
    rng = np.random.RandomState(seed)
    d1 = rng.randn(B, N, D).astype(np.float32)
    d2 = rng.randn(B, M or N, D).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    valid = rng.rand(B, N) > 0.2
    return d1, d2, valid


@pytest.mark.parametrize("mode", ["all", "proper", "dual"])
def test_infonce_matches_reference(mode):
    _ref_paths()
    from mast3r.losses import InfoNCE

    from gd3d.ops.matching_loss import infonce_loss

    d1, d2, valid = _rand_descs(seed=1)
    ref = InfoNCE(temperature=0.07, mode=mode, reduction="mean")
    with torch.no_grad():
        ref_val = ref(torch.from_numpy(d1), torch.from_numpy(d2),
                      torch.from_numpy(valid))
    got = infonce_loss(d1, d2, valid, temperature=0.07, mode=mode)
    np.testing.assert_allclose(float(got), float(ref_val), rtol=2e-5)


def test_infonce_euclidean_matches_reference():
    _ref_paths()
    from mast3r.losses import InfoNCE

    from gd3d.ops.matching_loss import infonce_loss

    d1, d2, valid = _rand_descs(seed=2)
    ref = InfoNCE(temperature=0.07, mode="all", reduction="mean")
    with torch.no_grad():
        ref_val = ref(torch.from_numpy(d1), torch.from_numpy(d2),
                      torch.from_numpy(valid), euc=True)
    got = infonce_loss(d1, d2, valid, temperature=0.07, mode="all", euc=True)
    np.testing.assert_allclose(float(got), float(ref_val), rtol=2e-5)


def test_ap_scores_match_reference_torch_mode():
    _ref_paths()
    from mast3r.losses import APLoss

    from gd3d.ops.matching_loss import ap_scores, get_similarities

    d1, d2, valid = _rand_descs(seed=3, N=16)
    ap = APLoss(nq="torch", reduction="none")
    with torch.no_grad():
        t1, t2 = torch.from_numpy(d1), torch.from_numpy(d2)
        ref_scores = ap.loss(t1, t2, None)
    got = ap_scores(np.asarray(get_similarities(d1, d2)))
    np.testing.assert_allclose(np.asarray(got), ref_scores.numpy(),
                               rtol=1e-6)


def test_conf_matching_loss_matches_reference():
    _ref_paths()
    from mast3r.losses import ConfMatchingLoss, InfoNCE, MatchingLoss

    from gd3d.ops.matching_loss import conf_matching_loss

    rng = np.random.RandomState(4)
    B, H, W, D, N = 2, 8, 10, 16, 12
    desc1 = rng.randn(B, H, W, D).astype(np.float32)
    desc2 = rng.randn(B, H, W, D).astype(np.float32)
    conf1 = (1 + np.exp(rng.randn(B, H, W))).astype(np.float32)
    conf2 = (1 + np.exp(rng.randn(B, H, W))).astype(np.float32)
    corres1 = np.stack([rng.randint(0, W, (B, N)),
                        rng.randint(0, H, (B, N))], -1).astype(np.int64)
    corres2 = np.stack([rng.randint(0, W, (B, N)),
                        rng.randint(0, H, (B, N))], -1).astype(np.int64)
    valid = rng.rand(B, N) > 0.25

    gt1 = {"corres": corres1, "valid_corres": valid}
    gt2 = {"corres": corres2}
    pred1 = {"desc": desc1, "desc_conf": conf1}
    pred2 = {"desc": desc2, "desc_conf": conf2}

    ref = ConfMatchingLoss(
        MatchingLoss(InfoNCE(temperature=0.07, mode="all",
                             reduction="none")),
        alpha=0.3, confmode="prod")
    with torch.no_grad():
        t = lambda x: torch.from_numpy(np.asarray(x))
        ref_val, _ = ref.compute_loss(
            {"corres": t(corres1), "valid_corres": t(valid)},
            {"corres": t(corres2)},
            {"desc": t(desc1), "desc_conf": t(conf1)},
            {"desc": t(desc2), "desc_conf": t(conf2)})
    got, details = conf_matching_loss(
        gt1, gt2, pred1, pred2, alpha=0.3, confmode="prod",
        temperature=0.07, mode="all")
    np.testing.assert_allclose(float(got), float(ref_val), rtol=2e-5)


@pytest.mark.parametrize("seed,quantile", [
    (5, 0.5),   # integral order-statistic index
    (5, 0.37),  # fractional index — torch.quantile interpolates
    (7, 0.8),
])
def test_conf_matching_loss_neg_quantile_matches_reference(seed, quantile):
    _ref_paths()
    from mast3r.losses import ConfMatchingLoss, InfoNCE, MatchingLoss

    from gd3d.ops.matching_loss import conf_matching_loss

    rng = np.random.RandomState(seed)
    B, H, W, D, N = 1, 6, 6, 8, 10
    desc1 = rng.randn(B, H, W, D).astype(np.float32)
    desc2 = rng.randn(B, H, W, D).astype(np.float32)
    conf1 = (1 + np.exp(rng.randn(B, H, W))).astype(np.float32)
    conf2 = (1 + np.exp(rng.randn(B, H, W))).astype(np.float32)
    corres1 = np.stack([rng.randint(0, W, (B, N)),
                        rng.randint(0, H, (B, N))], -1).astype(np.int64)
    corres2 = np.stack([rng.randint(0, W, (B, N)),
                        rng.randint(0, H, (B, N))], -1).astype(np.int64)
    valid = rng.rand(B, N) > 0.4

    ref = ConfMatchingLoss(
        MatchingLoss(InfoNCE(temperature=0.07, mode="all",
                             reduction="none")),
        alpha=0.3, confmode="mean", neg_conf_loss_quantile=quantile)
    with torch.no_grad():
        t = lambda x: torch.from_numpy(np.asarray(x))
        ref_val, _ = ref.compute_loss(
            {"corres": t(corres1), "valid_corres": t(valid)},
            {"corres": t(corres2)},
            {"desc": t(desc1), "desc_conf": t(conf1)},
            {"desc": t(desc2), "desc_conf": t(conf2)})
    got, _ = conf_matching_loss(
        {"corres": corres1, "valid_corres": valid}, {"corres": corres2},
        {"desc": desc1, "desc_conf": conf1},
        {"desc": desc2, "desc_conf": conf2},
        alpha=0.3, confmode="mean", temperature=0.07, mode="all",
        neg_conf_loss_quantile=quantile)
    np.testing.assert_allclose(float(got), float(ref_val), rtol=2e-4)


def test_blockwise_matches_direct_when_small_and_permuted_when_large():
    from gd3d.ops.matching_loss import blockwise_infonce, infonce_loss

    d1, d2, valid = _rand_descs(seed=6, N=16)
    got = blockwise_infonce(d1, d2, valid, blocksize=4096)
    np.testing.assert_allclose(
        float(got), float(infonce_loss(d1, d2, valid)), rtol=1e-6)

    # large N: block-diagonal application equals looping the chunks
    d1, d2, valid = _rand_descs(seed=7, B=1, N=32, D=8)
    perm = np.random.RandomState(0).permutation(32)[None]
    got = blockwise_infonce(d1, d2, valid, perm=perm, blocksize=8)
    import jax.numpy as jnp

    p = perm[0]
    chunks = []
    for lo in range(0, 32, 8):
        sel = p[lo: lo + 8]
        chunks.append((d1[:, sel], d2[:, sel], valid[:, sel]))
    # equivalent: one big masked mean over all per-chunk loss maps
    num = den = 0.0
    for c1, c2, v in chunks:
        li = infonce_loss(c1, c2, v)
        num += float(li) * int(v.sum())
        den += int(v.sum())
    np.testing.assert_allclose(float(got), num / den, rtol=1e-5)


def test_conf_matching_loss_is_jittable_and_differentiable():
    import jax
    import jax.numpy as jnp

    from gd3d.ops.matching_loss import conf_matching_loss

    rng = np.random.RandomState(8)
    B, H, W, D, N = 1, 6, 6, 8, 10
    gt1 = {"corres": rng.randint(0, 6, (B, N, 2)),
           "valid_corres": rng.rand(B, N) > 0.3}
    gt2 = {"corres": rng.randint(0, 6, (B, N, 2))}
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    desc1 = jnp.asarray(unit(rng.randn(B, H, W, D)), jnp.float32)
    desc2 = jnp.asarray(unit(rng.randn(B, H, W, D)), jnp.float32)
    conf = jnp.asarray(1 + np.exp(rng.randn(B, H, W)), jnp.float32)

    @jax.jit
    def f(d1, d2):
        loss, _ = conf_matching_loss(
            gt1, gt2, {"desc": d1, "desc_conf": conf},
            {"desc": d2, "desc_conf": conf})
        return loss

    g = jax.grad(f)(desc1, desc2)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
