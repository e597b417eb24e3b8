"""BEV / image visualization utilities (SURVEY.md T6).

Off the critical path: matplotlib drawing of point clouds, gt boxes
(green) and detections (red, alpha by score) for debugging.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from dcf.config import VoxelConfig
from dcf.geometry import np_boxes


def draw_bev(path: str, points: np.ndarray, vox: VoxelConfig,
             gt_boxes: Optional[np.ndarray] = None,
             det_boxes: Optional[np.ndarray] = None,
             det_scores: Optional[np.ndarray] = None) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    pts = np.asarray(points)
    keep = ((pts[:, 0] >= vox.x_min) & (pts[:, 0] < vox.x_max)
            & (pts[:, 1] >= vox.y_min) & (pts[:, 1] < vox.y_max))
    pts = pts[keep]
    ax.scatter(pts[:, 1], pts[:, 0], s=0.2, c="0.6", linewidths=0)

    def draw_boxes(boxes7, color, alpha=1.0, scores=None):
        if boxes7 is None or len(boxes7) == 0:
            return
        corners = np_boxes.box_corners_bev(
            np.asarray(boxes7)[:, [0, 1, 3, 4, 6]])
        for k, poly in enumerate(corners):
            a = alpha if scores is None else 0.3 + 0.7 * float(scores[k])
            loop = np.vstack([poly, poly[:1]])
            ax.plot(loop[:, 1], loop[:, 0], color=color, alpha=a, lw=1.2)

    draw_boxes(gt_boxes, "tab:green")
    draw_boxes(det_boxes, "tab:red", scores=det_scores)
    ax.set_xlim(vox.y_max, vox.y_min)
    ax.set_ylim(vox.x_min, vox.x_max)
    ax.set_xlabel("y (m, left)")
    ax.set_ylabel("x (m, forward)")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def draw_image_with_boxes(path: str, image: np.ndarray, boxes7, calib,
                          color=(255, 64, 64)) -> None:
    """Project 3D boxes into the camera image and draw wireframes."""
    import cv2
    from dcf.geometry.boxes import boxes3d_corners
    import jax.numpy as jnp

    img = np.ascontiguousarray(np.asarray(image)[..., ::-1])  # RGB->BGR
    if boxes7 is not None and len(boxes7):
        corners = np.asarray(boxes3d_corners(jnp.asarray(boxes7)))
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for box in corners:
            uvz = calib.velo_to_image(box)
            if (uvz[:, 2] <= 0.1).any():
                continue
            uv = uvz[:, :2].astype(int)
            for a, b in edges:
                cv2.line(img, tuple(uv[a]), tuple(uv[b]), color[::-1], 1,
                         cv2.LINE_AA)
    cv2.imwrite(path, img)
