"""Evaluation entry point (SURVEY.md L6 / 3.3).

    python -m dcf.cli.evaluate --workdir runs/full --data-root /data/kitti \
        --split val [--results-dir runs/full/results]
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from dcf.cli.common import add_data_args, resolve_dataset


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--results-dir", default=None)
    p.add_argument("--num-frames", type=int, default=None)
    p.add_argument("--score-threshold", type=float, default=None)
    p.add_argument("--batch-size", type=int, default=8,
                   help="frames per device batch during inference")
    p.add_argument("--num-points", type=int, default=40,
                   help="40=R40 (official), 11=R11, 0=exact area-under-PR")
    p.add_argument("--metrics", default="3d,bev",
                   help="comma list of 3d/bev/bbox")
    add_data_args(p)
    args = p.parse_args(argv)
    from dcf.cli.common import apply_platform
    apply_platform(args)

    from dcf.models.detector import ContFuseDetector
    from dcf.train import checkpoint as ckpt
    from dcf.train.state import create_train_state
    from dcf.eval.evaluate import run_eval
    from dcf.data.preprocess import frame_to_example

    ckpt_dir = os.path.join(args.workdir, "checkpoints")
    cfg = ckpt.load_config(ckpt_dir)
    dataset = resolve_dataset(args)

    model = ContFuseDetector(cfg)
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v[None]) if hasattr(v, "shape") else v
             for k, v in frame_to_example(dataset[0], cfg).items()}
    params = jax.jit(model.init)(jax.random.key(0), batch)
    template = create_train_state(cfg, params)
    latest = ckpt.latest_checkpoint(ckpt_dir)
    if latest is None:
        raise SystemExit(f"no checkpoint in {ckpt_dir}")
    state = ckpt.restore_checkpoint(latest, template)
    print(f"evaluating {latest}")

    results = run_eval(cfg, model, state.params, dataset,
                       result_dir=args.results_dir,
                       score_threshold=args.score_threshold,
                       num_frames=args.num_frames,
                       num_points=args.num_points,
                       batch_size=args.batch_size,
                       metrics=tuple(args.metrics.split(",")))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
