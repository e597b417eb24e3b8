"""Split evaluation: inference over a dataset + KITTI AP (SURVEY.md 3.3).

Drives the jitted end-to-end inference function over every frame of a
dataset, converts the padded device outputs into per-frame detection
lists, optionally writes KITTI-format result txts, and computes 3D/BEV AP
with the numpy evaluator.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from dcf.config import Config
from dcf.data.kitti import CLASS_NAMES, write_kitti_result
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.eval.inference import make_inference_fn
from dcf.eval.kitti_eval import (FrameDetections, FrameGroundTruth, evaluate)
from dcf.models.anchors import anchor_pack
from dcf.models.detector import ContFuseDetector


def run_eval(cfg: Config, model: ContFuseDetector, params, dataset,
             result_dir: Optional[str] = None,
             score_threshold: Optional[float] = None,
             num_frames: Optional[int] = None) -> Dict[str, float]:
    """Evaluate params over a dataset; returns the AP dict."""
    infer = jax.jit(make_inference_fn(cfg, model))
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
    thr = (score_threshold if score_threshold is not None
           else cfg.head.score_threshold)
    if result_dir:
        os.makedirs(result_dir, exist_ok=True)

    gts: List[FrameGroundTruth] = []
    dets: List[FrameDetections] = []
    n = len(dataset) if num_frames is None else min(num_frames, len(dataset))
    for i in range(n):
        frame = dataset[i]
        batch = {k: jnp.asarray(v) for k, v in
                 stack_examples([frame_to_example(frame, cfg)]).items()}
        out = jax.device_get(infer(params, batch, pack))
        keep = out["valid"][0] & (out["scores"][0] >= thr)
        boxes = out["boxes"][0][keep]
        scores = out["scores"][0][keep]
        classes = out["classes"][0][keep]
        dets.append(FrameDetections(boxes7=boxes, scores=scores,
                                    classes=classes))
        gts.append(FrameGroundTruth(boxes7=frame.boxes,
                                    classes=frame.labels,
                                    difficulty=frame.difficulty))
        if result_dir:
            names = [CLASS_NAMES[c] for c in classes]
            write_kitti_result(
                os.path.join(result_dir, frame.frame_id + ".txt"),
                names, boxes, scores, frame.calib,
                image_shape=frame.image.shape)

    results = {}
    results.update(evaluate(gts, dets, metric="3d"))
    results.update(evaluate(gts, dets, metric="bev"))
    return results
