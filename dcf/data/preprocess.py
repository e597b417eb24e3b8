"""Frame -> static-shape model example (SURVEY.md D7 host half).

Bridges the variable-size host world (raw KITTI frames) and the
static-shape device world: pads/subsamples points, letterboxes the image to
the configured size (folding any resize scale into the projection matrix),
and pads gt boxes to a fixed capacity with a mask.
"""

from __future__ import annotations

from typing import Dict

import cv2
import numpy as np

from dcf.config import Config
from dcf.data.kitti import Frame
from dcf.data.voxelize import crop_and_pad


def _resize_to_fit(image: np.ndarray, cfg: Config):
    """Aspect-preserving resize into (cfg.image.height, cfg.image.width);
    dtype-preserving (the native s2d path consumes the resized u8
    directly). Returns (resized, scale)."""
    H, W = cfg.image.height, cfg.image.width
    h, w = image.shape[:2]
    scale = min(H / h, W / w)
    if scale != 1.0:
        image = cv2.resize(image, (int(round(w * scale)),
                                   int(round(h * scale))),
                           interpolation=cv2.INTER_LINEAR)
    return image, scale


def prepare_image(image: np.ndarray, cfg: Config):
    """Letterbox `image` into (cfg.image.height, cfg.image.width).

    Returns (image_f32 [H, W, 3] in [0,1], scale factor applied).
    """
    H, W = cfg.image.height, cfg.image.width
    image, scale = _resize_to_fit(image, cfg)
    h2, w2 = image.shape[:2]
    out = np.zeros((H, W, 3), np.float32)
    out[:min(h2, H), :min(w2, W)] = (
        image[:min(h2, H), :min(w2, W)].astype(np.float32) / 255.0)
    return out, scale


def prepare_image_s2d(image: np.ndarray, cfg: Config):
    """resize + normalize + letterbox + space-to-depth(4), fused in the
    native core when available (one u8 -> f32 pass; /255 via an exact
    IEEE-divide table, so bit-identical to prepare_image + s2d_image,
    which remains the tested numpy twin/fallback).

    Returns ([H/4, W/4, 48] f32, scale)."""
    resized, scale = _resize_to_fit(image, cfg)
    if resized.dtype == np.uint8:
        from dcf import native
        out = native.image_s2d_u8(resized, cfg.image.height,
                                  cfg.image.width)
        if out is not None:
            return out, scale
    H, W = cfg.image.height, cfg.image.width
    h2, w2 = resized.shape[:2]
    full = np.zeros((H, W, 3), np.float32)
    full[:min(h2, H), :min(w2, W)] = (
        resized[:min(h2, H), :min(w2, W)].astype(np.float32) / 255.0)
    return s2d_image(full), scale


def sort_points_host(points: np.ndarray, mask: np.ndarray, cfg: Config):
    """Fine-grid row-major stable sort of the padded cloud (host half of
    dcf.models.fusion.sort_points_for_fusion).

    The key is computed in float32 with the device's exact arithmetic
    ((x - x_min) / cell, then floor), so the order is bit-identical to
    the in-jit argsort it replaces; running it here puts the O(P log P)
    sort in the prefetch thread pool instead of the device critical path
    (FusionConfig.host_sorted_points).
    """
    vox = cfg.voxel
    fine = min(cfg.backbone.fusion_strides)
    from dcf import native
    res = native.sort_points_fine(points, mask, vox.x_min, vox.y_min,
                                  vox.voxel_size, fine, vox.grid_x,
                                  vox.grid_y)
    if res is not None:                   # counting sort == stable argsort
        return res
    Hf, Wf = vox.grid_x // fine, vox.grid_y // fine
    cell = np.float32(vox.voxel_size * fine)
    pts = points.astype(np.float32, copy=False)
    ix = np.floor((pts[:, 0] - np.float32(vox.x_min)) / cell).astype(np.int32)
    iy = np.floor((pts[:, 1] - np.float32(vox.y_min)) / cell).astype(np.int32)
    inb = mask & (ix >= 0) & (ix < Hf) & (iy >= 0) & (iy < Wf)
    key = np.where(inb, ix * Wf + iy, Hf * Wf)
    order = np.argsort(key, kind="stable")
    return points[order], mask[order]


def fusion_host_arrays(points: np.ndarray, mask: np.ndarray,
                       v2i: np.ndarray, cfg: Config) -> Dict[str, np.ndarray]:
    """Per-scale fusion binning ranks + the projection, host half
    (FusionConfig.host_binned_ranks).

    The fusion binning needs, per point and per BEV scale, its stable
    rank among its cell's valid points in arrival order. On device that
    took segmented scans + 4 cumsum-image gathers per coarse scale
    (12 gathers x 0.175 ms at B=1 on v5e); here it's O(P) numpy in the
    prefetch pool. All arithmetic is float32 with the device formulas
    (dcf.geometry.transforms.project_velo_to_image, dcf.ops.bilinear's
    inside test, the voxel floor), and the device consumes `points_uvz`
    instead of re-projecting, so plane construction is bit-identical to
    the on-device path (tested). Points must already be in their final
    (host-sorted) order: ranks index arrival order.

    Returns:
      {"points_uvz": [P, 3] f32 (u, v, depth),
       "fusion_rank": [S, P] int32, -1 where the point is invalid for
       that scale (padding / behind camera / outside that pyramid
       level's image / outside the BEV grid), else the in-cell rank,
       "fusion_row_cum": [L] int32 shared fine-row cumulative histogram
       (cum[x] == #points with fine-grid row < x; the scale-invariant
       half of every fusion_windows call, fusion_kernel.fine_row_cum)}.
    """
    from dcf.models.fusion import fusion_row_cum_len
    vox = cfg.voxel
    pts = points.astype(np.float32, copy=False)
    m = v2i.astype(np.float32)
    # numpy BLAS f32 sgemm, matching the device's Precision.HIGHEST dot
    # bit-for-bit on XLA:CPU (dcf.geometry.transforms
    # .project_velo_to_image's precision note)
    uvw = pts[:, :3] @ m[:, :3].T + m[:, 3]

    from dcf import native
    uvz = native.uvw_to_uvz(uvw)          # exact-IEEE twin of the chain
    if uvz is None:
        depth = uvw[:, 2:3]
        uv = (uvw[:, :2] / np.maximum(np.abs(depth), np.float32(1e-6))
              * np.sign(depth))
        uvz = np.concatenate([uv, depth], axis=-1).astype(np.float32)

    from dcf.models.fusion import fusion_row_cum_len as _rcl
    res = native.fusion_ranks(
        pts, mask, uvz, cfg.backbone.fusion_strides, vox.x_min,
        vox.y_min, vox.voxel_size, vox.grid_x, vox.grid_y,
        cfg.image.height, cfg.image.width, _rcl(cfg))
    if res is not None:                   # bit-identical numpy twin below
        return {"points_uvz": uvz, "fusion_rank": res[0],
                "fusion_row_cum": res[1]}

    in_front = uvz[:, 2] > 0.1

    P = len(pts)
    ranks = np.full((len(cfg.backbone.fusion_strides), P), -1, np.int32)
    for si, s in enumerate(cfg.backbone.fusion_strides):
        istride = min(2 * s, 32)                  # fusion.image_stride_for
        Hi = cfg.image.height // istride
        Wi = cfg.image.width // istride
        u = uvz[:, 0] / np.float32(istride)
        v = uvz[:, 1] / np.float32(istride)
        inside = (u >= 0) & (u <= Wi - 1) & (v >= 0) & (v <= Hi - 1)
        H, W = vox.grid_x // s, vox.grid_y // s
        cell = np.float32(vox.voxel_size * s)
        ix = np.floor((pts[:, 0] - np.float32(vox.x_min))
                      / cell).astype(np.int64)
        iy = np.floor((pts[:, 1] - np.float32(vox.y_min))
                      / cell).astype(np.int64)
        ok = (mask & in_front & inside
              & (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W))
        cid = np.where(ok, ix * W + iy, H * W)
        order = np.argsort(cid, kind="stable")   # keeps arrival order
        sc = cid[order]
        start = np.r_[True, sc[1:] != sc[:-1]]
        run_start = np.maximum.accumulate(
            np.where(start, np.arange(P), 0))
        rank_sorted = np.arange(P) - run_start
        valid_sorted = ok[order]
        ranks[si, order[valid_sorted]] = rank_sorted[valid_sorted]

    # shared fine-row cum (fine_rows_for_fusion's exact f32 arithmetic)
    fine = min(cfg.backbone.fusion_strides)
    Hf = vox.grid_x // fine
    Wf = vox.grid_y // fine
    cellf = np.float32(vox.voxel_size * fine)
    fx = np.floor((pts[:, 0] - np.float32(vox.x_min)) / cellf
                  ).astype(np.int32)
    fy = np.floor((pts[:, 1] - np.float32(vox.y_min)) / cellf
                  ).astype(np.int32)
    finb = mask & (fx >= 0) & (fx < Hf) & (fy >= 0) & (fy < Wf)
    L = fusion_row_cum_len(cfg)
    counts = np.bincount(fx[finb], minlength=L - 1).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return {"points_uvz": uvz, "fusion_rank": ranks,
            "fusion_row_cum": cum}


def s2d_image(image: np.ndarray) -> np.ndarray:
    """Space-to-depth(4): [H, W, C] -> [H/4, W/4, 16*C], matching the
    ImageBackbone patchify stem's in-graph layout exactly (channel
    (a*4 + b)*C + c == image[4i+a, 4j+b, c])."""
    H, W, C = image.shape
    assert H % 4 == 0 and W % 4 == 0, (H, W)
    return (image.reshape(H // 4, 4, W // 4, 4, C)
            .transpose(0, 2, 1, 3, 4).reshape(H // 4, W // 4, 16 * C))


def frame_to_example(frame: Frame, cfg: Config, seed: int = 0
                     ) -> Dict[str, np.ndarray]:
    """Build the static-shape example dict consumed by the jitted model."""
    points, mask = crop_and_pad(frame.points, cfg.voxel, seed=seed)
    if cfg.with_fusion and cfg.fusion.host_sorted_points:
        points, mask = sort_points_host(points, mask, cfg)
    if cfg.with_camera and cfg.image.host_s2d:
        image, scale = prepare_image_s2d(frame.image, cfg)
    else:
        image, scale = prepare_image(frame.image, cfg)
    v2i = frame.calib.velo_to_image_matrix.copy()
    v2i[:2] *= scale                     # resize folded into projection

    mb = cfg.augment.max_boxes
    gt_boxes = np.zeros((mb, 7), np.float32)
    gt_labels = np.zeros((mb,), np.int32)
    gt_mask = np.zeros((mb,), bool)
    n = min(len(frame.boxes), mb)
    if n:
        gt_boxes[:n] = frame.boxes[:n]
        gt_labels[:n] = frame.labels[:n]
        gt_mask[:n] = True

    out = {
        "points": points,
        "point_mask": mask,
        "image": image,
        "velo_to_image": v2i.astype(np.float32),
        "gt_boxes": gt_boxes,
        "gt_labels": gt_labels,
        "gt_mask": gt_mask,
    }
    if (cfg.with_fusion and cfg.fusion.host_binned_ranks
            and cfg.fusion.host_sorted_points):
        # ranks index arrival order, so they require the final (sorted)
        # point order -- host_binned_ranks rides host_sorted_points
        out.update(fusion_host_arrays(points, mask,
                                      out["velo_to_image"], cfg))
    return out


def stack_examples(examples) -> Dict[str, np.ndarray]:
    """Collate a list of example dicts into a batched dict."""
    return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
