"""End-to-end torch-CPU oracle of the full detector forward
(VERDICT round-2 item 4; SURVEY.md 4.2 "torch cross-check layer").

A float64 torch mirror of `dcf.models.detector.ContFuseDetector.apply`
(voxelize -> image ResNet -> BEV stages with interleaved continuous
fusion -> FPN -> head) that consumes the *flax params* and the same
numpy batch, written against the documented semantics -- NOT by calling
any dcf device code. It is the strongest reference-diff proxy available
while /root/reference is empty, and becomes the A/B harness against the
real reference the moment it mounts.

Mirrored conventions (each the documented behavior of the named module):
  - XLA "SAME" padding: pad_total = (ceil(in/s)-1)*s + k - in, low half
    first (dcf/models/layers.py ConvNorm / flax nn.Conv).
  - flax GroupNorm: contiguous channel groups, eps 1e-6.
  - patchify stem: space-to-depth(4) + 1x1 ConvNorm (dcf/models/resnet.py).
  - upsample2x: nearest (dcf/models/layers.py).
  - voxelizer: occupancy per z-slice + mean intensity
    (dcf/data/voxelize.py rasterize_bev).
  - fusion: stable-sorted binning with per-cell capacity, (2r+1)^2
    neighborhood, K nearest by BEV distance to the cell center, image
    half per point / geometric half per pair, masked K-sum
    (dcf/models/fusion.py + dcf/ops/knn.py + fusion_kernel reference).
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import torch
import torch.nn.functional as TF

DT = torch.float64


def _same_pad(x: torch.Tensor, k: int, s: int,
              value: float = 0.0) -> torch.Tensor:
    """XLA SAME padding for an NCHW tensor, kernel k, stride s."""
    _, _, h, w = x.shape

    def pads(n):
        total = max((math.ceil(n / s) - 1) * s + k - n, 0)
        return total // 2, total - total // 2

    t, b = pads(h)
    l, r = pads(w)
    return TF.pad(x, (l, r, t, b), value=value)


def _num_groups(channels: int) -> int:
    for g in (32, 16, 8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


def _conv_norm(x: torch.Tensor, p: Dict, stride: int,
               relu: bool = True) -> torch.Tensor:
    """dcf.models.layers.ConvNorm: conv(no bias, SAME) -> GroupNorm -> relu."""
    kern = torch.as_tensor(np.asarray(p["Conv_0"]["kernel"]), dtype=DT)
    kern = kern.permute(3, 2, 0, 1)                   # HWIO -> OIHW
    k = kern.shape[-1]
    x = TF.conv2d(_same_pad(x, k, stride), kern, stride=stride)
    gn = p["GroupNorm_0"]
    cout = kern.shape[0]
    x = TF.group_norm(
        x, _num_groups(cout),
        weight=torch.as_tensor(np.asarray(gn["scale"]), dtype=DT),
        bias=torch.as_tensor(np.asarray(gn["bias"]), dtype=DT), eps=1e-6)
    return TF.relu(x) if relu else x


def _basic_block(x: torch.Tensor, p: Dict, stride: int) -> torch.Tensor:
    y = _conv_norm(x, p["ConvNorm_0"], stride)
    y = _conv_norm(y, p["ConvNorm_1"], 1, relu=False)
    if "ConvNorm_2" in p:
        x = _conv_norm(x, p["ConvNorm_2"], stride, relu=False)
    return TF.relu(y + x)


def _rasterize_bev(points: np.ndarray, mask: np.ndarray, vox) -> torch.Tensor:
    gx, gy, nz = vox.grid_x, vox.grid_y, vox.num_z_slices
    pts = torch.as_tensor(points, dtype=DT)
    ix = torch.floor((pts[:, 0] - vox.x_min) / vox.voxel_size).long()
    iy = torch.floor((pts[:, 1] - vox.y_min) / vox.voxel_size).long()
    iz = torch.floor((pts[:, 2] - vox.z_min) / vox.z_slice_size).long()
    inb = (torch.as_tensor(mask) & (ix >= 0) & (ix < gx) & (iy >= 0)
           & (iy < gy) & (iz >= 0) & (iz < nz))
    occ = torch.zeros((gx, gy, nz), dtype=DT)
    occ[ix[inb], iy[inb], iz[inb]] = 1.0
    ssum = torch.zeros((gx, gy), dtype=DT)
    cnt = torch.zeros((gx, gy), dtype=DT)
    ssum.index_put_((ix[inb], iy[inb]), pts[inb, 3], accumulate=True)
    cnt.index_put_((ix[inb], iy[inb]), torch.ones(int(inb.sum()), dtype=DT),
                   accumulate=True)
    inten = ssum / torch.clamp(cnt, min=1.0)
    return torch.cat([occ, inten[..., None]], dim=-1)      # [gx, gy, C]


def _image_backbone(image: np.ndarray, p: Dict, bb) -> Dict[int, torch.Tensor]:
    # patchify stem: space-to-depth(4) + 1x1 ConvNorm (dcf/models/resnet.py);
    # the batch image may arrive already s2d'd (ImageConfig.host_s2d)
    x = torch.as_tensor(image, dtype=DT)                         # HWC
    H, W, C = x.shape
    if C == 3:
        x = (x.reshape(H // 4, 4, W // 4, 4, C).permute(0, 2, 1, 3, 4)
             .reshape(H // 4, W // 4, 16 * C))
    x = x.permute(2, 0, 1)[None]                                 # NCHW
    x = _conv_norm(x, p["ConvNorm_0"], 1)
    feats = {}
    stride, bi = 4, 0
    for stage in range(len(bb.image_stage_channels)):
        first = 1 if stage == 0 else 2
        x = _basic_block(x, p[f"BasicBlock_{bi}"], first)
        bi += 1
        for _ in range(bb.image_blocks_per_stage[stage] - 1):
            x = _basic_block(x, p[f"BasicBlock_{bi}"], 1)
            bi += 1
        if stage > 0:
            stride *= 2
        feats[stride] = x
    return feats


def _bilinear(feat: torch.Tensor, uv: torch.Tensor):
    """feat [H, W, C]; uv [P, 2] -> (values [P, C], inside [P])."""
    H, W, _ = feat.shape
    u, v = uv[:, 0], uv[:, 1]
    inside = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    u = torch.clamp(u, 0.0, W - 1.0)
    v = torch.clamp(v, 0.0, H - 1.0)
    u0 = torch.floor(u)
    v0 = torch.floor(v)
    du = (u - u0)[:, None]
    dv = (v - v0)[:, None]
    u0i, v0i = u0.long(), v0.long()
    u1i = torch.clamp(u0i + 1, max=W - 1)
    v1i = torch.clamp(v0i + 1, max=H - 1)
    f00 = feat[v0i, u0i]
    f01 = feat[v0i, u1i]
    f10 = feat[v1i, u0i]
    f11 = feat[v1i, u1i]
    out = ((f00 * (1 - du) + f01 * du) * (1 - dv)
           + (f10 * (1 - du) + f11 * du) * dv)
    out = torch.where(inside[:, None], out, torch.zeros_like(out))
    return out, inside


def _fusion_layer(points: np.ndarray, mask: np.ndarray, v2i: np.ndarray,
                  img_feat: torch.Tensor, p: Dict, cfg, bev_stride: int,
                  image_stride: int) -> torch.Tensor:
    vox, fus = cfg.voxel, cfg.fusion
    H = vox.grid_x // bev_stride
    W = vox.grid_y // bev_stride
    cell = vox.voxel_size * bev_stride
    K, r, cap = fus.num_neighbors, fus.search_radius_cells, fus.bin_capacity
    hid = fus.hidden_dim

    pts = torch.as_tensor(points, dtype=DT)
    msk = torch.as_tensor(mask)

    # projection (dcf.geometry.transforms.project_velo_to_image)
    m = torch.as_tensor(v2i, dtype=DT)
    uvw = pts[:, :3] @ m[:, :3].T + m[:, 3]
    depth = uvw[:, 2]
    uv = uvw[:, :2] / torch.clamp(depth.abs(), min=1e-6)[:, None] \
        * torch.sign(depth)[:, None]
    in_front = depth > 0.1

    # image features per point + frustum filter (dcf.models.fusion)
    feat_hw_c = img_feat[0].permute(1, 2, 0)          # [Hf, Wf, C]
    pfeat, inside = _bilinear(feat_hw_c, uv / float(image_stride))
    img_ok = msk & in_front & inside

    # image half of the first MLP layer, per point
    w_img = torch.as_tensor(np.asarray(p["img_proj"]["kernel"]), dtype=DT)
    z1 = pfeat @ w_img                                # [P, hid]

    # binning with per-cell capacity, insertion by point order (the
    # model feeds fine-grid-sorted points; the caller passes them in
    # that same order so capacity eviction matches). Binning uses the
    # RAW coordinates; the payload consumed by distances/geo features is
    # quantized below, mirroring the packed-plane layout
    # (fusion_kernel's _D note / quantize_payload_xyz: x/y rounded
    # through bf16 relative to the point's own cell center, z through
    # plain bf16, all in f32 arithmetic).
    ix = torch.floor((pts[:, 0] - vox.x_min) / cell).long()
    iy = torch.floor((pts[:, 1] - vox.y_min) / cell).long()
    inb = img_ok & (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)

    import ml_dtypes
    p32 = points[:, :3].astype(np.float32)
    ix32 = np.floor((p32[:, 0] - np.float32(vox.x_min))
                    / np.float32(cell)).astype(np.int32)
    iy32 = np.floor((p32[:, 1] - np.float32(vox.y_min))
                    / np.float32(cell)).astype(np.int32)
    ccx = np.float32(vox.x_min) + (ix32.astype(np.float32) + 0.5) \
        * np.float32(cell)
    ccy = np.float32(vox.y_min) + (iy32.astype(np.float32) + 0.5) \
        * np.float32(cell)

    def _bf16(v):
        return v.astype(ml_dtypes.bfloat16).astype(np.float32)

    ptsq = torch.as_tensor(np.stack(
        [ccx + _bf16(p32[:, 0] - ccx),
         ccy + _bf16(p32[:, 1] - ccy),
         _bf16(p32[:, 2])], axis=-1), dtype=DT)
    cells: Dict[int, list] = {}
    for i in torch.nonzero(inb).flatten().tolist():
        c = int(ix[i]) * W + int(iy[i])
        slots = cells.setdefault(c, [])
        if len(slots) < cap:
            slots.append(i)

    w_geo = torch.as_tensor(np.asarray(p["geo_kernel"]), dtype=DT)  # [4,hid]
    b_geo = torch.as_tensor(np.asarray(p["geo_bias"]), dtype=DT)
    acc = torch.zeros((H, W, hid), dtype=DT)
    cnt = torch.zeros((H, W, 1), dtype=DT)
    for row in range(H):
        cx = vox.x_min + (row + 0.5) * cell
        for col in range(W):
            cy = vox.y_min + (col + 0.5) * cell
            cand = []
            for di in range(-r, r + 1):
                for dj in range(-r, r + 1):
                    rr, cc = row + di, col + dj
                    if 0 <= rr < H and 0 <= cc < W:
                        cand.extend(cells.get(rr * W + cc, []))
            if not cand:
                continue
            cxy = torch.tensor([cx, cy], dtype=DT)
            d2 = ((ptsq[cand, :2] - cxy) ** 2).sum(-1)
            order = torch.argsort(d2, stable=True)[:K]
            sel = [cand[int(o)] for o in order]
            geo = torch.cat(
                [ptsq[sel, :2] - cxy, ptsq[sel, 2:3],
                 torch.sqrt(torch.clamp(d2[order], max=1e6))[:, None]],
                dim=-1)                               # [k, 4]
            h = TF.relu(z1[sel] + geo @ w_geo + b_geo)
            acc[row, col] = h.sum(0)
            cnt[row, col] = float(len(sel))

    w_out = torch.as_tensor(np.asarray(p["out_kernel"]), dtype=DT)
    b_out = torch.as_tensor(np.asarray(p["out_bias"]), dtype=DT)
    out = acc @ w_out + cnt * b_out                   # [H, W, out_ch]
    return out.permute(2, 0, 1)[None]                 # NCHW


def _sort_points(points: np.ndarray, mask: np.ndarray, vox,
                 fine_stride: int):
    """Mirror of dcf.models.fusion.sort_points_for_fusion (stable)."""
    Hf = vox.grid_x // fine_stride
    Wf = vox.grid_y // fine_stride
    cell = vox.voxel_size * fine_stride
    ix = np.floor((points[:, 0] - vox.x_min) / cell).astype(np.int64)
    iy = np.floor((points[:, 1] - vox.y_min) / cell).astype(np.int64)
    inb = mask & (ix >= 0) & (ix < Hf) & (iy >= 0) & (iy < Wf)
    key = np.where(inb, ix * Wf + iy, Hf * Wf)
    order = np.argsort(key, kind="stable")
    return points[order], mask[order]


def _upsample2x(x: torch.Tensor) -> torch.Tensor:
    return x.repeat_interleave(2, dim=2).repeat_interleave(2, dim=3)


def _fpn(feats: Dict[int, torch.Tensor], p: Dict, bb) -> torch.Tensor:
    strides = sorted(feats.keys())
    top = max(strides)
    y = _conv_norm(feats[top], p["ConvNorm_0"], 1, relu=False)
    stride, ci = top, 1
    while stride > bb.head_stride:
        stride //= 2
        y = _upsample2x(y)
        y = y + _conv_norm(feats[stride], p[f"ConvNorm_{ci}"], 1,
                           relu=False)
        ci += 1
    return _conv_norm(y, p[f"ConvNorm_{ci}"], 1)


def _head(x: torch.Tensor, p: Dict, cfg) -> Dict[str, np.ndarray]:
    for i in range(cfg.head.num_convs):
        x = _conv_norm(x, p[f"ConvNorm_{i}"], 1)
    out = {}
    names = ["cls", "reg"] + (
        ["dir"] if cfg.head.use_direction_classifier else [])
    for name in names:
        kern = torch.as_tensor(np.asarray(p[name]["kernel"]),
                               dtype=DT).permute(3, 2, 0, 1)
        bias = torch.as_tensor(np.asarray(p[name]["bias"]), dtype=DT)
        y = TF.conv2d(x, kern, bias=bias)
        out[name] = y[0].permute(1, 2, 0).numpy()     # HWC
    return out


def torch_forward(params, batch: Dict[str, np.ndarray],
                  cfg) -> Dict[str, np.ndarray]:
    """Full-forward oracle for ONE frame (batch arrays carry B=1)."""
    p = params["params"]
    bb = cfg.backbone
    points = np.asarray(batch["points"][0], np.float64)
    mask = np.asarray(batch["point_mask"][0])

    # s2d(2) raster (dcf.data.voxelize.rasterize_bev_s2d layout)
    pseudo = _rasterize_bev(points, mask, cfg.voxel)  # [gx, gy, C]
    gx, gy, C = pseudo.shape
    pseudo = (pseudo.reshape(gx // 2, 2, gy // 2, 2, C)
              .permute(0, 2, 1, 3, 4).reshape(gx // 2, gy // 2, 4 * C))
    x = pseudo.permute(2, 0, 1)[None]                 # NCHW

    img_feats = None
    if cfg.with_camera:
        img_feats = _image_backbone(np.asarray(batch["image"][0]),
                                    p["image_backbone"], bb)

    if cfg.with_fusion:
        pts_f, mask_f = _sort_points(points, mask, cfg.voxel,
                                     min(bb.fusion_strides))
        v2i = np.asarray(batch["velo_to_image"][0], np.float64)

    feats: Dict[int, torch.Tensor] = {}
    stride = 1
    for stage in range(len(bb.bev_stage_channels)):
        # stage 0's stride-2 is baked into the s2d raster
        x = _basic_block(x, p[f"bev_stage{stage}_block0"],
                         1 if stage == 0 else 2)
        for b in range(bb.bev_blocks_per_stage[stage] - 1):
            x = _basic_block(x, p[f"bev_stage{stage}_block{b + 1}"], 1)
        stride *= 2
        if cfg.with_fusion and stride in bb.fusion_strides:
            img_stride = min(stride * 2, 32)
            fused = _fusion_layer(pts_f, mask_f, v2i,
                                  img_feats[img_stride],
                                  p[f"fusion_s{stride}"], cfg, stride,
                                  img_stride)
            x = x + fused
        feats[stride] = x

    y = _fpn(feats, p["fpn"], bb)
    return _head(y, p["head"], cfg)
