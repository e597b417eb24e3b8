"""Full ContFuse detector assembly (SURVEY.md L3, M1-M7).

One Flax module covering every BASELINE.json config milestone:
  - lidar-only (config 1): pseudo-image -> BEV stages -> FPN -> head
  - camera branch (config 2): + image ResNet pyramid
  - fusion (configs 3/4): continuous-fusion layers interleaved *between*
    BEV stages so fused features feed the next stage (paper fig. 3)

The forward is a pure function of (params, batch): voxelization happens
inside, so a raw padded frame goes in and dense head maps come out in one
jit. Decode + NMS live in dcf.models.head.decode_and_nms.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcf.config import Config
from dcf.data.voxelize import rasterize_bev_batch
from dcf.models.bev_backbone import BEVFPN
from dcf.models.fusion import (ContinuousFusionLayer, fine_rows_for_fusion,
                               image_stride_for, sort_points_for_fusion)
from dcf.ops.pallas.fusion_kernel import bin_points_planes_multi
from dcf.models.head import DetectionHead
from dcf.models.layers import BasicBlock
from dcf.models.resnet import ImageBackbone


class ContFuseDetector(nn.Module):
    """batch dict -> {"cls", "reg", "dir"} dense prediction maps.

    Expected batch keys (all static shapes, SURVEY.md hard-part #2):
      points: [B, P, 4], point_mask: [B, P]
      image: [B, Hi, Wi, 3] float32 in [0, 1]       (with_camera)
      velo_to_image: [B, 3, 4]                       (with_fusion)
    """

    cfg: Config

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.backbone.dtype)

        # jnp unique-indices sorted-scatter is the ONE production
        # rasterizer (a Pallas slab kernel measured 3x slower on v5e and
        # was retired -- see VoxelConfig's note). Emitted directly in
        # space-to-depth(2) layout: stage 0 then runs stride 1 on an
        # 84-channel input instead of relayout-copying the full-res
        # 21-channel raster twice (~1 ms at B=1 on v5e).
        pseudo = rasterize_bev_batch(batch["points"],
                                     batch["point_mask"], cfg.voxel,
                                     dtype=dtype, s2d=True)

        img_feats = None
        if cfg.with_camera:
            img_feats = ImageBackbone(cfg.backbone, name="image_backbone")(
                batch["image"])

        if cfg.with_fusion:
            # one fine-grid sort shared by every fusion scale (row-slab
            # contiguity for the fused kernel's z1 DMA; see fusion.py).
            # With host_sorted_points the prefetch pipeline already
            # sorted (dcf.data.preprocess.sort_points_host) and only the
            # row ids are computed here -- no in-jit argsort.
            fine = min(cfg.backbone.fusion_strides)
            if cfg.fusion.host_sorted_points:
                pts_f, mask_f = batch["points"], batch["point_mask"]
                fine_row = fine_rows_for_fusion(pts_f, mask_f,
                                                cfg.voxel, fine)
            else:
                pts_f, mask_f, fine_row = sort_points_for_fusion(
                    batch["points"], batch["point_mask"], cfg.voxel,
                    fine)
            # host-precomputed projection + per-scale binning ranks
            # (dcf.data.preprocess.fusion_host_arrays); hand-built
            # batches without the keys fall back to on-device binning
            uvz = batch.get("points_uvz")
            ranks = batch.get("fusion_rank")      # [B, S, P]
            if not cfg.fusion.host_binned_ranks:
                uvz = ranks = None
            # shared fine-row cumulative histogram: the only O(P) work
            # in every scale's fusion_windows, and it is scale-invariant
            # -- host-shipped when available, else computed once here
            row_cum = None
            if cfg.fusion.use_pallas:
                row_cum = batch.get("fusion_row_cum")
                if row_cum is None:
                    from dcf.models.fusion import fusion_row_cum_len
                    from dcf.ops.pallas.fusion_kernel import fine_row_cum
                    L = fusion_row_cum_len(cfg)
                    row_cum = jax.vmap(
                        lambda fr: fine_row_cum(fr, L - 1))(fine_row)
            # with host ranks + the Pallas kernel, ALL scales' packed
            # field planes come from ONE flat scatter (scatter cost
            # tracks update count + per-op overhead; four per-scale
            # scatters were ~0.6 ms each at B=1 on v5e)
            scale_planes = None
            if ranks is not None and cfg.fusion.use_pallas:
                strides = cfg.backbone.fusion_strides
                B, P = pts_f.shape[:2]
                gidx = jnp.broadcast_to(
                    jnp.arange(P, dtype=jnp.float32)[None, :, None],
                    (B, P, 1))
                payload = jnp.concatenate([pts_f[..., :3], gidx], -1)
                scale_planes = jax.vmap(
                    lambda pay, rk: bin_points_planes_multi(
                        pay, rk, (cfg.voxel.x_min, cfg.voxel.y_min),
                        [cfg.voxel.voxel_size * s for s in strides],
                        [(cfg.voxel.grid_x // s, cfg.voxel.grid_y // s)
                         for s in strides],
                        cfg.fusion.bin_capacity,
                        cfg.fusion.search_radius_cells,
                        cfg.fusion.pallas_tile_rows))(payload, ranks)

        # no stride-1 stem: a full-resolution conv + norm over the
        # 704x800 grid costs ~2.5 ms for little accuracy benefit; stage 0
        # (stride 2) consumes the pseudo-image directly
        x = pseudo
        feats: Dict[int, jnp.ndarray] = {}
        stride = 1
        for stage, channels in enumerate(cfg.backbone.bev_stage_channels):
            # stage 0's stride-2 is already baked into the s2d raster:
            # kernel-2/stride-1 entry conv covers the same spatial taps
            # as 3x3/stride-2 on the full-res pseudo-image
            s0 = stage == 0
            x = BasicBlock(channels, stride=1 if s0 else 2,
                           entry_kernel=2 if s0 else 3, dtype=dtype,
                           quant=cfg.backbone.quant_mode,
                           name=f"bev_stage{stage}_block0")(x)
            for b in range(cfg.backbone.bev_blocks_per_stage[stage] - 1):
                x = BasicBlock(channels, stride=1, dtype=dtype,
                               quant=cfg.backbone.quant_mode,
                               name=f"bev_stage{stage}_block{b + 1}")(x)
            stride *= 2
            if cfg.with_fusion and stride in cfg.backbone.fusion_strides:
                img_stride = image_stride_for(stride, cfg)
                si = cfg.backbone.fusion_strides.index(stride)
                fused = ContinuousFusionLayer(
                    cfg, out_channels=channels, bev_stride=stride,
                    image_stride=img_stride,
                    name=f"fusion_s{stride}")(
                        pts_f, mask_f, fine_row,
                        batch["velo_to_image"], img_feats[img_stride],
                        uvz=uvz,
                        rank=None if ranks is None else ranks[:, si],
                        planes=None if scale_planes is None
                        else scale_planes[si],
                        row_cum=row_cum)
                x = x + fused.astype(dtype)
            feats[stride] = x

        y = BEVFPN(cfg.backbone, name="fpn")(feats)
        return DetectionHead(cfg, name="head")(y)
