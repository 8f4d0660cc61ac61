"""DUSt3R pretraining-criterion parity: gd3d/ops/regr3d.py vs the
reference's ACTUAL dust3r.losses modules (Regr3D variants + ConfLoss),
on random pointmaps/poses/masks. Slow tier (imports the reference torch
stack)."""
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


def _rand_views(seed=0, B=2, H=8, W=12, conf=True):
    rng = np.random.RandomState(seed)

    def pose():
        # random rotations via QR + small translations
        out = []
        for _ in range(B):
            q, _ = np.linalg.qr(rng.randn(3, 3))
            q *= np.sign(np.linalg.det(q))
            m = np.eye(4)
            m[:3, :3] = q
            m[:3, 3] = rng.randn(3) * 0.3
            out.append(m)
        return np.stack(out).astype(np.float32)

    def views():
        gt = {
            "camera_pose": pose(),
            "pts3d": (rng.randn(B, H, W, 3) * 0.5
                      + np.array([0, 0, 2.0])).astype(np.float32),
            "valid_mask": rng.rand(B, H, W) > 0.25,
        }
        return gt

    gt1, gt2 = views(), views()
    pred1 = {"pts3d": (rng.randn(B, H, W, 3) * 0.5
                       + np.array([0, 0, 2.0])).astype(np.float32)}
    pred2 = {"pts3d_in_other_view": (rng.randn(B, H, W, 3) * 0.5
                                     + np.array([0, 0, 2.0])).astype(np.float32)}
    if conf:
        # conf head output: exp-activation >= 1 (reference conf_mode exp/1)
        pred1["conf"] = (1.0 + np.exp(rng.randn(B, H, W))).astype(np.float32)
        pred2["conf"] = (1.0 + np.exp(rng.randn(B, H, W))).astype(np.float32)
    return gt1, gt2, pred1, pred2


def _to_torch(d):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in d.items()}


def _ref_loss(loss_obj, gt1, gt2, pred1, pred2):
    with torch.no_grad():
        out = loss_obj(_to_torch(gt1), _to_torch(gt2), _to_torch(pred1),
                       _to_torch(pred2))
    return out


@pytest.mark.parametrize("norm_mode,gt_scale", [
    ("avg_dis", False), ("median_dis", False), (None, False),
    ("avg_dis", True),
])
def test_conf_regr3d_matches_reference(norm_mode, gt_scale):
    _ref_paths()
    from dust3r.losses import ConfLoss, L21, Regr3D

    from gd3d.ops.regr3d import conf_regr3d_loss

    gt1, gt2, pred1, pred2 = _rand_views(seed=1)
    ref_loss, ref_details = _ref_loss(
        ConfLoss(Regr3D(L21, norm_mode=norm_mode, gt_scale=gt_scale),
                 alpha=0.2),
        gt1, gt2, pred1, pred2)
    got, details = conf_regr3d_loss(
        gt1, gt2, pred1, pred2, alpha=0.2, norm_mode=norm_mode,
        gt_scale=gt_scale)
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(
        float(details["conf_loss_1"]), ref_details["conf_loss_1"], rtol=2e-5)
    np.testing.assert_allclose(
        float(details["conf_loss2"]), ref_details["conf_loss2"], rtol=2e-5)


@pytest.mark.parametrize("variant,kwargs", [
    ("Regr3D_ShiftInv", dict(shift_inv=True)),
    ("Regr3D_ShiftInv", dict(shift_inv=True, norm_mode=None)),
    ("Regr3D_ScaleInv", dict(scale_inv=True)),
    ("Regr3D_ScaleShiftInv", dict(shift_inv=True, scale_inv=True)),
])
def test_invariant_variants_match_reference(variant, kwargs):
    _ref_paths()
    import dust3r.losses as ref_losses

    from gd3d.ops.regr3d import conf_regr3d_loss

    gt1, gt2, pred1, pred2 = _rand_views(seed=2)
    kwargs = dict(kwargs)
    norm_mode = kwargs.pop("norm_mode", "avg_dis")
    ref_cls = getattr(ref_losses, variant)
    ref_loss, _ = _ref_loss(
        ref_losses.ConfLoss(ref_cls(ref_losses.L21, norm_mode=norm_mode),
                            alpha=0.2),
        gt1, gt2, pred1, pred2)
    got, _ = conf_regr3d_loss(gt1, gt2, pred1, pred2, alpha=0.2,
                              norm_mode=norm_mode, **kwargs)
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=2e-5)


def test_regr3d_dist_clip_and_plain_criterion():
    """Regr3D without ConfLoss: masked mean of l1+l2 over all valid pixels
    equals the reference's reduction='mean' over boolean-selected pixels;
    dist_clip drops far-away GT points from the masks."""
    _ref_paths()
    from dust3r.losses import L21, Regr3D

    import jax.numpy as jnp
    from gd3d.ops.regr3d import regr3d_loss

    gt1, gt2, pred1, pred2 = _rand_views(seed=3, conf=False)
    ref = Regr3D(L21, norm_mode="avg_dis")
    with torch.no_grad():
        g1, g2, p1, p2 = (_to_torch(gt1), _to_torch(gt2), _to_torch(pred1),
                          _to_torch(pred2))
        gt_pts1, gt_pts2, pr1, pr2, m1, m2, _ = ref.get_all_pts3d(
            g1, g2, p1, p2, dist_clip=2.5)
        ref_l1 = ref.criterion(pr1[m1], gt_pts1[m1])
        ref_l2 = ref.criterion(pr2[m2], gt_pts2[m2])
    l1, l2, v1, v2 = regr3d_loss(gt1, gt2, pred1, pred2, dist_clip=2.5)
    np.testing.assert_array_equal(np.asarray(v1), m1.numpy())
    np.testing.assert_array_equal(np.asarray(v2), m2.numpy())
    got1 = float(jnp.where(v1, l1, 0.0).sum() / v1.sum())
    got2 = float(jnp.where(v2, l2, 0.0).sum() / v2.sum())
    np.testing.assert_allclose(got1, float(ref_l1), rtol=2e-5)
    np.testing.assert_allclose(got2, float(ref_l2), rtol=2e-5)


def _mast3r_views(seed=0, B=2, H=8, W=12, metric=(True, False)):
    gt1, gt2, pred1, pred2 = _rand_views(seed=seed, B=B, H=H, W=W)
    rng = np.random.RandomState(seed + 100)
    for gt in (gt1, gt2):
        gt["sky_mask"] = rng.rand(B, H, W) > 0.7
    gt1["is_metric_scale"] = np.asarray(metric[:B])
    gt2["is_metric_scale"] = gt1["is_metric_scale"].copy()
    return gt1, gt2, pred1, pred2


@pytest.mark.parametrize("kwargs", [
    dict(norm_mode="?avg_dis"),
    dict(norm_mode="avg_dis"),
    dict(norm_mode="?avg_dis", max_metric_scale=3.0),
    dict(norm_mode="?avg_dis", loss_in_log=True),
    dict(norm_mode="?avg_dis", loss_in_log="before"),
    dict(norm_mode="?avg_dis", sky_loss_value=0.0),
])
def test_mast3r_conf_regr3d_matches_reference(kwargs):
    """Reference-direct vs the actual mast3r.losses fork of Regr3D
    (metric-scale opt-out, sky-mask loss, log warps) under ConfLoss."""
    _ref_paths()
    import mast3r.losses as ml
    from dust3r.losses import L21

    from gd3d.ops.regr3d import mast3r_conf_regr3d_loss

    gt1, gt2, pred1, pred2 = _mast3r_views(seed=6)
    ref = ml.ConfLoss(
        ml.Regr3D(L21, norm_mode=kwargs.get("norm_mode", "?avg_dis"),
                  sky_loss_value=kwargs.get("sky_loss_value", 2.0),
                  max_metric_scale=kwargs.get("max_metric_scale", False),
                  loss_in_log=kwargs.get("loss_in_log", False)),
        alpha=0.2)
    with torch.no_grad():
        ref_val, _ = ref(_to_torch(gt1), _to_torch(gt2), _to_torch(pred1),
                         _to_torch(pred2))
    got, _ = mast3r_conf_regr3d_loss(gt1, gt2, pred1, pred2, alpha=0.2,
                                     **kwargs)
    np.testing.assert_allclose(float(got), float(ref_val), rtol=3e-5)


def test_zero_valid_pixels_returns_zero():
    from gd3d.ops.regr3d import conf_regr3d_loss

    gt1, gt2, pred1, pred2 = _rand_views(seed=4)
    gt1["valid_mask"] = np.zeros_like(gt1["valid_mask"])
    gt2["valid_mask"] = np.zeros_like(gt2["valid_mask"])
    loss, _ = conf_regr3d_loss(gt1, gt2, pred1, pred2)
    assert float(loss) == 0.0 and np.isfinite(float(loss))


@pytest.mark.parametrize("fit_mode", ["avg", "median",
                                      "weiszfeld_stop_grad"])
def test_find_opt_scaling_matches_reference(fit_mode):
    _ref_paths()
    from dust3r.inference import find_opt_scaling as ref_fn

    from gd3d.ops.regr3d import find_opt_scaling

    rng = np.random.RandomState(7)
    B, H, W = 2, 6, 8
    gt1 = (rng.randn(B, H, W, 3) * 0.3 + [0, 0, 2]).astype(np.float32)
    gt2 = (rng.randn(B, H, W, 3) * 0.3 + [0, 0, 2]).astype(np.float32)
    pr1 = gt1 * 1.7 + rng.randn(B, H, W, 3).astype(np.float32) * 0.05
    pr2 = gt2 * 1.7 + rng.randn(B, H, W, 3).astype(np.float32) * 0.05
    v1 = rng.rand(B, H, W) > 0.2
    v2 = rng.rand(B, H, W) > 0.2
    with torch.no_grad():
        t = torch.from_numpy
        ref = ref_fn(t(gt1), t(gt2), t(pr1), t(pr2), fit_mode=fit_mode,
                     valid1=t(v1), valid2=t(v2))
    got = find_opt_scaling(gt1, gt2, pr1, pr2, fit_mode=fit_mode,
                           valid1=v1, valid2=v2)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-5)
    assert np.all(np.abs(np.asarray(got) - 1.7) < 0.1)


def test_conf_regr3d_is_jittable_and_differentiable():
    import jax
    import jax.numpy as jnp

    from gd3d.ops.regr3d import conf_regr3d_loss

    gt1, gt2, pred1, pred2 = _rand_views(seed=5)

    @jax.jit
    def f(p1, p2):
        loss, _ = conf_regr3d_loss(gt1, gt2, {**pred1, **p1},
                                   {**pred2, **p2})
        return loss

    g1, g2 = jax.grad(f, argnums=(0, 1))(
        {"pts3d": jnp.asarray(pred1["pts3d"])},
        {"pts3d_in_other_view": jnp.asarray(pred2["pts3d_in_other_view"])})
    assert np.isfinite(np.asarray(g1["pts3d"])).all()
    assert np.abs(np.asarray(g2["pts3d_in_other_view"])).max() > 0
