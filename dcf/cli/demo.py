"""Single-frame end-to-end demo (SURVEY.md 3.2 north-star path).

    python -m dcf.cli.demo [--config full] [--synthetic 1 | --data-root ...]
    python -m dcf.cli.demo --config tiny --viz /tmp/demo.png

Raw frame in -> 3D boxes out, one jitted call; optional BEV visualization.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from dcf.cli.common import add_data_args, config_by_name, resolve_dataset


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="tiny",
                   choices=["lidar", "camera", "fusion1", "full", "tiny"])
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--viz", default=None, help="write a BEV png here")
    add_data_args(p)
    args = p.parse_args(argv)
    from dcf.cli.common import apply_platform
    apply_platform(args)
    if not args.synthetic and not args.data_root:
        args.synthetic = 1

    cfg = config_by_name(args.config)
    dataset = resolve_dataset(args)
    frame = dataset[args.frame]

    from dcf.data.preprocess import frame_to_example, stack_examples
    from dcf.eval.inference import make_inference_fn, device_anchor_pack
    from dcf.models.detector import ContFuseDetector
    from dcf.data.kitti import CLASS_NAMES

    batch = {k: jnp.asarray(v) for k, v in
             stack_examples([frame_to_example(frame, cfg)]).items()}
    model = ContFuseDetector(cfg)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    infer = jax.jit(make_inference_fn(cfg, model))
    pack = device_anchor_pack(cfg)
    out = jax.device_get(infer(params, batch, pack))

    keep = out["valid"][0]
    boxes = out["boxes"][0][keep]
    scores = out["scores"][0][keep]
    classes = out["classes"][0][keep]
    print(f"frame {frame.frame_id}: {keep.sum()} detections "
          f"({len(frame.boxes)} gt boxes)")
    for b, s, c in zip(boxes[:10], scores[:10], classes[:10]):
        print(f"  {CLASS_NAMES[c]:<10} score={s:.3f} "
              f"xyz=({b[0]:.1f},{b[1]:.1f},{b[2]:.1f}) "
              f"lwh=({b[3]:.1f},{b[4]:.1f},{b[5]:.1f}) yaw={b[6]:.2f}")

    if args.viz:
        from dcf.utils.viz import draw_bev
        draw_bev(args.viz, frame.points, cfg.voxel,
                 gt_boxes=frame.boxes, det_boxes=boxes, det_scores=scores)
        print(f"wrote {args.viz}")


if __name__ == "__main__":
    main()
