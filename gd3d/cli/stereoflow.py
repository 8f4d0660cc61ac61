"""gd3d-stereoflow: train / evaluate / predict CroCo-Stereo & CroCo-Flow.

The gd3d surface for the reference's vendored stereo/flow downstream suite:
  - train: dust3r/croco/stereoflow/train.py (criterion strings, crops
    352x704 stereo / 320x384 flow, AdamW(0.9, 0.95) wd 0.05, warmup+cosine)
  - eval/predict: dust3r/croco/stereoflow/test.py (tiled prediction at
    --tile-overlap with conf-weighted aggregation, metrics pickle/CSV,
    visu pngs, raw predictions)

Models run NHWC on the TPU; all tiles of an image pair are batched into ONE
forward (gd3d/stereoflow.py::tiled_pred) instead of the reference's
tile-by-tile python loop.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("gd3d-stereoflow")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--task", choices=["stereo", "flow"], default="stereo")
        sp.add_argument("--tiny", action="store_true",
                        help="2-layer test model (CI-sized)")
        sp.add_argument("--ckpt", type=str, default=None,
                        help="params .npz (flax tree) to load")
        sp.add_argument("--torch-ckpt", type=str, default=None,
                        help="reference CroCoDownstreamBinocular .pth to "
                             "convert and load (crocostereo.pth layout)")
        sp.add_argument("--no-conf", action="store_true",
                        help="criterion without confidence channel")

    t = sub.add_parser("train", help="fine-tune on (left,right,gt) pairs")
    common(t)
    t.add_argument("--root", required=True)
    t.add_argument("--layout", default="generic",
                   help="generic|sceneflow|kitti15|sintel|eth3d|middlebury")
    t.add_argument("--output", required=True)
    t.add_argument("--criterion", default=None,
                   help="reference criterion string; default per task "
                        "(train.py:52)")
    t.add_argument("--crop", type=int, nargs=2, default=None,
                   help="training crop; default 352 704 stereo / 320 384 "
                        "flow")
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--batch", type=int, default=2)
    t.add_argument("--lr", type=float, default=None,
                   help="default 3e-5 stereo / 2e-5 flow")
    t.add_argument("--warmup", type=int, default=10)
    t.add_argument("--weight-decay", type=float, default=0.05)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--ckpt-every", type=int, default=0)

    e = sub.add_parser("eval", help="tiled evaluation with dataset metrics")
    common(e)
    e.add_argument("--root", required=True)
    e.add_argument("--layout", default="generic")
    e.add_argument("--split", default="train", choices=["train", "test"],
                   help="dataset split for layouts that have one (kitti15 "
                        "training/ vs testing/, sintel)")
    e.add_argument("--output", required=True)
    e.add_argument("--tile-overlap", type=float, default=0.7)
    e.add_argument("--tile-conf-mode", default=None,
                   help="default conf_expsigmoid_15_3 stereo / _10_5 flow")
    e.add_argument("--crop", type=int, nargs=2, default=None)
    e.add_argument("--save", nargs="*", default=["metrics"],
                   help="metrics | pred | visu")

    pr = sub.add_parser("predict", help="one pair -> prediction file")
    common(pr)
    pr.add_argument("--left", required=True)
    pr.add_argument("--right", required=True)
    pr.add_argument("--output", required=True,
                    help=".npy/.pfm/.flo/.png target (format from extension)")
    pr.add_argument("--visu", type=str, default=None,
                    help="also write a visualization png here")
    pr.add_argument("--tile-overlap", type=float, default=0.7)
    pr.add_argument("--tile-conf-mode", default=None)
    pr.add_argument("--crop", type=int, nargs=2, default=None)

    return p.parse_args(argv)


def _build(args):
    """Model + params from flags."""
    import jax

    from gd3d.models.croco import CrocoConfig
    from gd3d.models.stereoflow import StereoFlow, StereoFlowConfig

    if args.tiny:
        croco = CrocoConfig(patch_size=16, enc_embed_dim=32, enc_depth=2,
                            enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                            dec_num_heads=2)
        hooks = (0, 1, 2, 3)
        cfg = StereoFlowConfig(croco=croco, task=args.task,
                               with_conf=not args.no_conf, hooks=hooks,
                               dpt_layer_dims=(8, 16, 24, 32),
                               dpt_feature_dim=16, dpt_last_dim=8)
    else:
        cfg = StereoFlowConfig(task=args.task, with_conf=not args.no_conf)
    model = StereoFlow(cfg)

    if args.torch_ckpt:
        import torch

        from gd3d.models.stereoflow import convert_stereoflow

        # weights_only=False: the released checkpoints pickle an
        # argparse.Namespace under 'args' (stereoflow/test.py:56)
        ckpt = torch.load(args.torch_ckpt, map_location="cpu",
                          weights_only=False)
        state = ckpt.get("model", ckpt)
        params = jax.tree_util.tree_map(
            np.asarray, convert_stereoflow(state, cfg))
    elif args.ckpt:
        from flax.traverse_util import unflatten_dict

        z = np.load(args.ckpt)
        params = unflatten_dict({tuple(k.split("/")): z[k] for k in z.files})
    else:
        size = 64 if args.tiny else 224
        dummy = np.zeros((1, size, size, 3), np.float32)
        params = jax.jit(model.init)(
            jax.random.key(0), dummy, dummy)["params"]
    return model, cfg, params


def _save_params(path, params) -> None:
    from flax.traverse_util import flatten_dict

    np.savez(path, **{"/".join(k): np.asarray(v)
                      for k, v in flatten_dict(params).items()})


def _criterion(args):
    from gd3d.stereoflow import CRITERIA, DEFAULT_CRITERION

    explicit = getattr(args, "criterion", None)
    name = explicit or DEFAULT_CRITERION[args.task]
    if name not in CRITERIA:
        raise SystemExit(
            f"unknown criterion {name!r}; choices: {sorted(CRITERIA)}")
    if args.no_conf:
        if explicit and CRITERIA[explicit].with_conf:
            raise SystemExit(
                f"--no-conf is incompatible with {explicit!r} (it consumes "
                "a confidence channel); drop one of the two flags")
        name = "L1Loss()"
    return CRITERIA[name]


def cmd_train(args) -> None:
    import jax
    import jax.numpy as jnp

    from gd3d.data.flowio import StereoFlowPairs, discover_pairs
    from gd3d.stereoflow import (DEFAULT_CROP, build_stereoflow_train_step,
                                 make_stereoflow_optimizer)

    crit = _criterion(args)
    model, cfg, params = _build(args)
    crop = tuple(args.crop) if args.crop else DEFAULT_CROP[args.task]
    if args.tiny and not args.crop:
        crop = (64, 96)
    pairs = discover_pairs(args.root, args.layout, args.task)
    pairs = [p for p in pairs if p[2] is not None]
    if not pairs:
        raise SystemExit(f"no training pairs with gt under {args.root}")
    ds = StereoFlowPairs(pairs, args.task, crop_size=crop, seed=args.seed)

    lr = args.lr or {"stereo": 3e-5, "flow": 2e-5}[args.task]
    tx = make_stereoflow_optimizer(lr, args.steps, args.warmup,
                                   args.weight_decay)
    opt_state = tx.init(params)
    step = build_stereoflow_train_step(model, crit, tx)

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    log = open(out / "train_log.jsonl", "a")
    t0 = time.perf_counter()
    for s in range(args.steps):
        idx = [int(rng.randint(len(ds))) for _ in range(args.batch)]
        items = [ds[i] for i in idx]
        img1 = jnp.asarray(np.stack([it["img1"] for it in items]))
        img2 = jnp.asarray(np.stack([it["img2"] for it in items]))
        gt = jnp.asarray(np.stack([it["gt"] for it in items]))
        params, opt_state, loss = step(params, opt_state, img1, img2, gt)
        rec = {"step": s, "loss": float(loss),
               "wall_s": round(time.perf_counter() - t0, 2)}
        log.write(json.dumps(rec) + "\n")
        log.flush()
        if s % max(1, args.steps // 10) == 0:
            print(f"step {s}: loss {rec['loss']:.4f}", flush=True)
        if args.ckpt_every and (s + 1) % args.ckpt_every == 0:
            _save_params(out / f"params_{s + 1:06d}.npz", params)
    _save_params(out / "params_final.npz", params)
    log.close()
    print(f"training finished -> {out / 'params_final.npz'}")


def _tiled_apply(model, params, cfg, args):
    import jax

    from gd3d.stereoflow import (DEFAULT_CROP, DEFAULT_TILE_CONF_MODE,
                                 tiled_pred)

    crop = tuple(args.crop) if args.crop else DEFAULT_CROP[args.task]
    if args.tiny and not args.crop:
        crop = (64, 96)
    conf_mode = args.tile_conf_mode or DEFAULT_TILE_CONF_MODE[args.task]

    def apply_fn(t1, t2):
        return model.apply({"params": params}, t1, t2)

    # one jit; XLA's own shape-keyed cache retraces per input size
    @jax.jit
    def run(img1, img2):
        return tiled_pred(apply_fn, img1, img2, crop=crop,
                          overlap=args.tile_overlap, conf_mode=conf_mode)

    def predict(img1_np, img2_np):
        import jax.numpy as jnp

        pred, _, c = run(jnp.asarray(img1_np[None]),
                         jnp.asarray(img2_np[None]))
        return np.asarray(pred[0]), np.asarray(c[0])

    return predict


def cmd_eval(args) -> None:
    from gd3d.data.flowio import StereoFlowPairs, discover_pairs
    from gd3d.stereoflow import FlowDatasetMetrics, StereoDatasetMetrics

    model, cfg, params = _build(args)
    predict = _tiled_apply(model, params, cfg, args)
    pairs = discover_pairs(args.root, args.layout, args.task,
                           split=args.split)
    ds = StereoFlowPairs(pairs, args.task, root=args.root)
    agg = (StereoDatasetMetrics if args.task == "stereo"
           else FlowDatasetMetrics)()
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(len(ds)):
        item = ds[i]
        pred, _ = predict(item["img1"], item["img2"])
        if "gt" in item:
            agg.add_batch(pred[None], item["gt"][None])
        if "pred" in args.save:
            np.save(out / f"{item['name']}_pred.npy", pred)
        if "visu" in args.save:
            _write_visu(out / f"{item['name']}_pred.png", pred, args.task,
                        item.get("gt"))
        print(f"[{i + 1}/{len(ds)}] {item['name']}", flush=True)
    if "metrics" in args.save:
        res = agg.get_results()
        with open(out / "metrics.json", "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res))


def _write_visu(path, pred, task, gt=None) -> None:
    import cv2

    from gd3d.data.flowio import flow_to_color, vis_disparity

    if task == "stereo":
        m = M = None
        if gt is not None and np.isfinite(gt).any():
            m = float(gt[np.isfinite(gt)].min())
            M = float(gt[np.isfinite(gt)].max())
        img = vis_disparity(pred[..., 0], m=m, M=M)
        cv2.imwrite(str(path), img)
    else:
        ref = gt if gt is not None else pred
        fin = ref[np.isfinite(ref[..., 0])]
        norm = float(np.sqrt((fin ** 2).sum(-1)).max()) if fin.size else None
        img = flow_to_color(pred.astype(np.float32), maxflow=norm)
        cv2.imwrite(str(path), img[..., ::-1])


def cmd_predict(args) -> None:
    from gd3d.data.flowio import (img_to_array, read_img, write_flo,
                                  write_kitti_disp, write_kitti_flow,
                                  write_pfm)

    model, cfg, params = _build(args)
    predict = _tiled_apply(model, params, cfg, args)
    img1 = img_to_array(read_img(args.left).astype(np.float32))
    img2 = img_to_array(read_img(args.right).astype(np.float32))
    pred, _ = predict(img1, img2)
    outp = args.output
    ext = os.path.splitext(outp)[1].lower()
    Path(outp).parent.mkdir(parents=True, exist_ok=True)
    if ext == ".npy":
        np.save(outp, pred)
    elif ext == ".pfm" and args.task == "stereo":
        write_pfm(outp, pred[..., 0].astype(np.float32))
    elif ext == ".pfm":
        # flow PFMs are 3-channel with a zero third band (read_pfm_flow)
        zero = np.zeros_like(pred[..., :1])
        write_pfm(outp, np.concatenate([pred, zero], -1).astype(np.float32))
    elif ext == ".flo":
        write_flo(outp, pred)
    elif ext == ".png" and args.task == "stereo":
        write_kitti_disp(outp, pred[..., 0])
    elif ext == ".png":
        write_kitti_flow(outp, pred)
    else:
        raise SystemExit(f"unknown output format {ext!r}")
    if args.visu:
        _write_visu(args.visu, pred, args.task)
    print(f"prediction -> {outp}")


def main(argv=None) -> None:
    args = parse_args(argv)
    {"train": cmd_train, "eval": cmd_eval, "predict": cmd_predict}[args.cmd](
        args)


if __name__ == "__main__":
    main()
