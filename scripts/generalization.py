"""Generalization run (VERDICT round-1 item 4): train the flagship config
on seed-varied synthetic frames, evaluate KITTI AP on a held-out set.

Overfit-one-frame proves plumbing; this proves the pipeline *learns*:
train frames and val frames are disjoint seed ranges of
make_varied_frame (object count / classes / poses / point density all
drawn per seed).

Usage: python scripts/generalization.py [--steps 1500] [--train-frames 64]
       [--val-frames 16] [--workdir /tmp/dcf_gen] [--batch 2]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class VariedDataset:
    def __init__(self, seeds):
        self.seeds = list(seeds)

    def __len__(self):
        return len(self.seeds)

    def __getitem__(self, i):
        from dcf.data.synthetic import make_varied_frame
        s = self.seeds[i]
        return make_varied_frame(frame_id=f"{s:06d}", seed=s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--train-frames", type=int, default=64)
    p.add_argument("--val-frames", type=int, default=16)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--dir-weight", type=float, default=None,
                   help="override LossConfig.dir_weight")
    p.add_argument("--gt-db", action="store_true",
                   help="build a gt-sampling db from the train frames "
                        "and train with gt-sampling on")
    p.add_argument("--image-paste", choices=("on", "off"), default="on",
                   help="camera-consistent image pasting for gt-sampling")
    p.add_argument("--workdir", default="/tmp/dcf_gen")
    p.add_argument("--preset", choices=("base", "fast"), default="base",
                   help="fast = width/depth-cut backbone trial "
                        "(VERDICT round-2 item 2 model-math cuts)")
    p.add_argument("--int8-eval", action="store_true",
                   help="additionally evaluate the trained checkpoint "
                        "through the int8 PTQ serving path (dcf.quant) "
                        "-- the AP ship-gate for quant_mode='int8'")
    p.add_argument("--ema", type=float, default=0.0,
                   help="params-EMA decay (TrainConfig.ema_decay); "
                        "0 disables")
    p.add_argument("--eval-every", type=int, default=0,
                   help="evaluate raw+EMA params on a PROBE split "
                        "(seeds 3000+, disjoint from train AND val) "
                        "every N steps; the best probe checkpoint "
                        "(max over steps of the min per-class exact "
                        "moderate AP) is additionally evaluated on val. "
                        "Curve written to workdir/eval_curve.json")
    p.add_argument("--probe-frames", type=int, default=8)
    p.add_argument("--resident-batches", type=int, default=0,
                   help="preload this many batches on device and cycle "
                        "them (TrainConfig.resident_batches; required "
                        "for long runs on tunneled backends whose "
                        "client leaks host->device transfers)")
    args = p.parse_args()

    from dataclasses import replace
    from dcf.config import multi_scale_config, resolve_platform
    from dcf.eval.evaluate import run_eval
    from dcf.models.detector import ContFuseDetector
    from dcf.train import checkpoint as ckpt
    from dcf.train.loop import train
    from dcf.train.state import create_train_state

    cfg = resolve_platform(multi_scale_config())
    if args.preset == "fast":
        cfg = replace(cfg, backbone=replace(
            cfg.backbone,
            bev_stage_channels=(48, 96, 144, 192),
            bev_blocks_per_stage=(1, 1, 2, 2),
            image_stage_channels=(48, 96, 192, 320),
            image_blocks_per_stage=(1, 1, 2, 2),
            fpn_channels=96),
            head=replace(cfg.head, head_channels=96))
    cfg = replace(cfg, train=replace(
        cfg.train, batch_size=args.batch, num_steps=args.steps,
        learning_rate=args.lr, warmup_steps=min(150, args.steps // 10),
        checkpoint_every=args.steps, log_every=50,
        ema_decay=args.ema, resident_batches=args.resident_batches))
    if args.dir_weight is not None:
        cfg = replace(cfg, loss=replace(cfg.loss,
                                        dir_weight=args.dir_weight))
    cfg = replace(cfg, augment=replace(
        cfg.augment, gt_sampling=args.gt_db,
        gt_sample_image_paste=args.image_paste == "on"))

    train_ds = VariedDataset(range(1000, 1000 + args.train_frames))
    val_ds = VariedDataset(range(2000, 2000 + args.val_frames))

    gt_db = None
    if args.gt_db:
        from dcf.data.augment import GTDatabase
        gt_db = GTDatabase.build(
            (train_ds[i] for i in range(len(train_ds))), min_points=8,
            with_image=True)
        print("gt-db sizes:",
              {k: len(v) for k, v in gt_db.db.items()}, flush=True)

    import jax
    from dcf.eval.inference import make_inference_fn
    model = ContFuseDetector(cfg)
    CLS = ("Car", "Pedestrian", "Cyclist")
    # ONE jitted inference fn for every eval below: jax.jit caches by
    # function identity, so per-call jits would recompile (~2 min on
    # TPU) for each of the probe/final/EMA/best evaluations
    infer = jax.jit(make_inference_fn(cfg, model))

    eval_hook = None
    curve = []
    best = {"score": -1.0, "params": None, "step": None, "kind": None}
    if args.eval_every:
        probe_ds = VariedDataset(range(3000, 3000 + args.probe_frames))

        def eval_hook(host_state, step):
            cands = [("raw", host_state.params)]
            if host_state.ema_params is not None:
                cands.append(("ema", host_state.ema_params))
            row = {"step": step}
            for kind, pr in cands:
                r = run_eval(cfg, model, pr, probe_ds, num_points=0,
                             metrics=("3d",), infer_fn=infer)
                aps = {c: round(r[f"{c}_3d_moderate"], 4) for c in CLS}
                row[kind] = aps
                score = min(aps.values())
                if score > best["score"]:
                    best.update(score=score, params=pr, step=step,
                                kind=kind)
            curve.append(row)
            print("probe-eval", json.dumps(row), flush=True)

    state = train(cfg, train_ds, args.workdir, gt_db=gt_db,
                  eval_hook=eval_hook, eval_every=args.eval_every)
    params = jax.device_get(state.params)

    results = {}
    for npts, tag in ((40, "R40"), (0, "exact")):
        r = run_eval(cfg, model, params, val_ds, num_points=npts,
                     infer_fn=infer)
        results.update({f"{k}_{tag}": round(v, 4) for k, v in r.items()
                        if "moderate" in k or "easy" in k})
    if state.ema_params is not None:
        r = run_eval(cfg, model, jax.device_get(state.ema_params), val_ds,
                     num_points=0, metrics=("3d",), infer_fn=infer)
        results.update({f"{k}_ema_exact": round(v, 4) for k, v in r.items()
                        if "moderate" in k})
    if best["params"] is not None:
        r = run_eval(cfg, model, best["params"], val_ds, num_points=0,
                     metrics=("3d",), infer_fn=infer)
        results.update({f"{k}_best_exact": round(v, 4)
                        for k, v in r.items() if "moderate" in k})
        results["best_step"] = best["step"]
        results["best_kind"] = best["kind"]
        with open(os.path.join(args.workdir, "eval_curve.json"), "w") as f:
            json.dump(curve, f, indent=2)

    if args.int8_eval:
        import jax.numpy as jnp
        from dcf.data.preprocess import frame_to_example, stack_examples
        from dcf.quant import calibrate, quant_config
        n_calib = min(8, len(train_ds) - len(train_ds) % 2)
        calib_batches = [
            {k: jnp.asarray(v) for k, v in stack_examples(
                [frame_to_example(train_ds[i], cfg),
                 frame_to_example(train_ds[i + 1], cfg)]).items()}
            for i in range(0, n_calib, 2)]
        qvars = calibrate(cfg, params, calib_batches)
        cfg_q = quant_config(cfg)
        model_q = ContFuseDetector(cfg_q)
        params_q = {"params": params["params"], **qvars}
        r = run_eval(cfg_q, model_q, params_q, val_ds, num_points=0)
        results.update({f"{k}_int8_exact": round(v, 4)
                        for k, v in r.items() if "moderate" in k})
    print(json.dumps(results, indent=2))
    with open(os.path.join(args.workdir, "generalization.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
