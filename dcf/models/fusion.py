"""Continuous fusion layer (SURVEY.md M3/M4 — the core novelty of ContFuse).

Per BEV pixel at each backbone scale (paper section 3.2, SURVEY.md 3.4):
  1. K nearest lidar points in the BEV plane      (grid-hash KNN, static)
  2. project each point through calib into the image plane
  3. bilinearly interpolate image features there
  4. concat the 3D geometric offset (point - target pixel)
  5. shared MLP, masked sum over K -> a BEV feature map added to the stream

TPU-native split (BASELINE.json:5 "fuse into single Pallas kernels at each
backbone scale"): projection + bilinear gather + the image half of the
first MLP layer are per-*point* (P rows, XLA — the convs feeding them are
XLA too); KNN selection + the geometric half + relu + the masked K-sum are
per-(pixel, neighbor) and run as ONE fused Pallas kernel per scale
(dcf.ops.pallas.fusion_kernel) with a custom VJP for training. The jnp
twin (`fused_fusion_reference`) is the parity reference and the CPU path.

Points outside the camera frustum never contribute camera features, so
they are filtered before binning — K-neighbor slots go to points the
camera actually sees (both paths share this, keeping parity exact).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcf.config import Config, VoxelConfig
from dcf.geometry.transforms import project_velo_to_image
from dcf.ops.bilinear import bilinear_sample
from dcf.ops.knn import bin_points_dense
from dcf.ops.pallas.fusion_kernel import (_plane_geometry,
                                          bin_points_planes,
                                          bin_points_planes_ranked,
                                          fused_fusion_planes,
                                          fused_fusion_reference,
                                          fusion_windows)

_ROW_SENTINEL = 1 << 20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def sort_points_for_fusion(points: jnp.ndarray, mask: jnp.ndarray,
                           vox: VoxelConfig, fine_stride: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort each frame's points by fine-BEV-grid cell id (row-major).

    Done ONCE per frame before the fusion layers: row-major order makes
    the points of any row-slab — at any coarser fusion scale, since cells
    nest — one contiguous index range, which is what lets the fused
    kernel DMA a bounded z1-table slab instead of gathering rows
    (dcf.ops.pallas.fusion_kernel).

    Returns (points_sorted [B, P, 4], mask_sorted [B, P],
    fine_row [B, P] int32 with a large sentinel for invalid points).
    """
    Hf = vox.grid_x // fine_stride
    Wf = vox.grid_y // fine_stride
    cell = vox.voxel_size * fine_stride

    def one(pts, msk):
        ix = jnp.floor((pts[:, 0] - vox.x_min) / cell).astype(jnp.int32)
        iy = jnp.floor((pts[:, 1] - vox.y_min) / cell).astype(jnp.int32)
        inb = msk & (ix >= 0) & (ix < Hf) & (iy >= 0) & (iy < Wf)
        key = jnp.where(inb, ix * Wf + iy, Hf * Wf)
        order = jnp.argsort(key)
        fr = jnp.where(inb, ix, _ROW_SENTINEL)
        return pts[order], msk[order], fr[order]

    return jax.vmap(one)(points, mask)


def fusion_row_cum_len(cfg: Config) -> int:
    """Length of the shared `fine_row_cum` table: max over fusion scales
    of (padded rows x fine-row ratio) + 1. Real fine rows are always
    strictly below every scale's span, so one table serves all scales
    (fusion_kernel.fusion_windows' `cum`)."""
    fine = min(cfg.backbone.fusion_strides)
    m = 0
    for s in cfg.backbone.fusion_strides:
        H = cfg.voxel.grid_x // s
        W = cfg.voxel.grid_y // s
        TH, H_eff, _, _, _ = _plane_geometry(
            H, W, cfg.fusion.search_radius_cells,
            cfg.fusion.pallas_tile_rows)
        m = max(m, H_eff * (s // fine))
    return m + 1


def fine_rows_for_fusion(points: jnp.ndarray, mask: jnp.ndarray,
                         vox: VoxelConfig, fine_stride: int) -> jnp.ndarray:
    """Elementwise fine-grid row ids for HOST-pre-sorted points.

    The sorting half of `sort_points_for_fusion` already happened on the
    host (dcf.data.preprocess.sort_points_host, bit-identical key); only
    the [B, P] row-id tensor is needed on device -- no argsort.
    """
    Hf = vox.grid_x // fine_stride
    Wf = vox.grid_y // fine_stride
    cell = vox.voxel_size * fine_stride
    ix = jnp.floor((points[..., 0] - vox.x_min) / cell).astype(jnp.int32)
    iy = jnp.floor((points[..., 1] - vox.y_min) / cell).astype(jnp.int32)
    inb = (mask & (ix >= 0) & (ix < Hf) & (iy >= 0) & (iy < Wf))
    return jnp.where(inb, ix, _ROW_SENTINEL)


class ContinuousFusionLayer(nn.Module):
    """One fusion layer at a fixed BEV stride / image stride pair.

    Expects points pre-sorted by `sort_points_for_fusion` (the detector
    does it once for all scales) along with their fine-grid rows.
    """

    cfg: Config
    out_channels: int
    bev_stride: int
    image_stride: int

    @nn.compact
    def __call__(self, points: jnp.ndarray, mask: jnp.ndarray,
                 fine_row: jnp.ndarray, velo_to_image: jnp.ndarray,
                 image_feat: jnp.ndarray,
                 uvz: jnp.ndarray | None = None,
                 rank: jnp.ndarray | None = None,
                 planes: jnp.ndarray | None = None,
                 row_cum: jnp.ndarray | None = None) -> jnp.ndarray:
        """Args:
          points: [B, P, 4] padded lidar points, fine-grid sorted.
          mask: [B, P] validity (sorted order).
          fine_row: [B, P] int32 fine-grid row per point (sorted order).
          velo_to_image: [B, 3, 4] combined projection matrices.
          image_feat: [B, Hf, Wf, C] image features at `image_stride`.
          uvz: [B, P, 3] HOST-projected (u, v, depth) per point
            (dcf.data.preprocess.fusion_host_arrays); None -> project
            on device.
          rank: [B, P] int32 HOST-computed in-cell rank at this scale
            (-1 invalid); None -> derive the binning on device.
          planes: [B, _D, C, RP, WP] PREBUILT packed field planes for
            this scale (the detector's one fused multi-scale scatter,
            fusion_kernel.bin_points_planes_multi); skips binning here.
            Pallas path only.
          row_cum: [B, L] shared fine-row cumulative histogram
            (fusion_kernel.fine_row_cum, L == fusion_row_cum_len(cfg));
            None -> per-layer histogram from fine_row.

        Returns:
          [B, H, W, out_channels] BEV feature contribution at `bev_stride`.
        """
        cfg = self.cfg
        vox = cfg.voxel
        fus = cfg.fusion
        H = vox.grid_x // self.bev_stride
        W = vox.grid_y // self.bev_stride
        cell = vox.voxel_size * self.bev_stride
        origin = (vox.x_min, vox.y_min)
        K = fus.num_neighbors
        r = fus.search_radius_cells
        dtype = jnp.dtype(cfg.backbone.dtype)
        B, P = points.shape[:2]
        hid = fus.hidden_dim

        # The image half of the first MLP layer is applied to the image
        # FEATURE MAP (a 1x1-conv-shaped Dense), and the per-point
        # bilinear sample reads the projected hid-wide map instead of
        # the C-wide pyramid level: bilinear interpolation commutes
        # exactly with a per-channel linear map, and the narrow map
        # shrinks the patch build and the backward scatter by C/hid
        # (up to 8x at the coarse scales).
        z1_map = nn.Dense(hid, use_bias=False, dtype=dtype,
                          param_dtype=jnp.float32,
                          name="img_proj")(image_feat.astype(dtype))

        if uvz is None:
            uvz = jax.vmap(lambda pts, proj:
                           project_velo_to_image(pts[:, :3], proj))(
                               points, velo_to_image)            # [B, P, 3]

        def prepare(pts, msk, fr, uvz_b, zmap, rank_b):
            # Image features are sampled once per *point* (P rows), not
            # per (pixel, neighbor) pair (H*W*K rows, ~20x more): each
            # point projects to a single image location, so per-pair work
            # reduces to the in-kernel one-hot selection after KNN.
            z1p, inside = bilinear_sample(
                zmap, uvz_b[..., :2] / float(self.image_stride))  # [P, hid]

            # bin payload: (x, y, z, sorted index as f32). The kernel's
            # planes pack the whole payload into two bf16-pair words
            # (x/y as cell-center offsets, z alongside gidx + 1; 16-bit
            # index -- P <= 65534, asserted in _scatter_planes); the
            # jnp twin quantizes x/y/z identically
            # (fusion_kernel.quantize_payload_xyz).
            payload = jnp.concatenate(
                [pts[:, :3],
                 jnp.arange(P, dtype=jnp.float32)[:, None]], axis=-1)
            if rank_b is not None:
                # host-precomputed binning (fusion_host_arrays): the
                # rank scans + cumsum-image gathers never run on device
                if fus.use_pallas:
                    binned = bin_points_planes_ranked(
                        payload, rank_b, origin, cell, (H, W),
                        fus.bin_capacity, r, fus.pallas_tile_rows)
                else:
                    binned = bin_points_dense(payload, rank_b >= 0,
                                              origin, cell, (H, W),
                                              fus.bin_capacity)
                return binned, z1p
            in_front = uvz_b[..., 2] > 0.1
            img_ok = msk & in_front & inside                     # [P]
            if fus.use_pallas:
                # scatter straight into the kernel's plane layout (no
                # [H, W, C, D] bins + per-scale transpose on the hot
                # path). The points arrive fine-cell sorted: the finest
                # fusion scale rank-scans them directly (presorted);
                # coarser scales derive rank-within-cell from fine-cell
                # count images (fine cells nest) -- NO per-scale argsort
                # anywhere (was ~0.6 ms/frame per coarse scale).
                ratio = self.bev_stride // min(cfg.backbone.fusion_strides)
                binned = bin_points_planes(
                    payload, img_ok, origin, cell, (H, W),
                    fus.bin_capacity, r, fus.pallas_tile_rows,
                    presorted=(ratio == 1), fine_ratio=ratio,
                    sort_valid=(fr < _ROW_SENTINEL))
            else:
                binned = bin_points_dense(payload, img_ok, origin, cell,
                                          (H, W), fus.bin_capacity)
            return binned, z1p

        # first-MLP-layer split: the image half (already applied to the
        # map above) is realized per point by the bilinear sample; the
        # geometric half is applied per pair inside the kernel / twin
        if planes is not None:
            assert fus.use_pallas, "prebuilt planes are the Pallas path"
            binned = planes
            z1 = jax.vmap(
                lambda u, zmap: bilinear_sample(
                    zmap, u[..., :2] / float(self.image_stride))[0])(
                        uvz, z1_map)
        elif rank is not None:
            binned, z1 = jax.vmap(
                lambda pts, msk, fr, u, zmap, rk:
                prepare(pts, msk, fr, u, zmap, rk))(
                    points, mask, fine_row, uvz, z1_map, rank)
        else:
            binned, z1 = jax.vmap(
                lambda pts, msk, fr, u, zmap:
                prepare(pts, msk, fr, u, zmap, None))(
                    points, mask, fine_row, uvz, z1_map)

        wg = self.param("geo_kernel", nn.initializers.lecun_normal(),
                        (4, hid), jnp.float32)
        bg = self.param("geo_bias", nn.initializers.zeros_init(),
                        (hid,), jnp.float32)
        wgt = jnp.transpose(wg)                                # [hid, 4]
        bg2 = bg[:, None]                                      # [hid, 1]

        if fus.use_pallas:
            ratio = self.bev_stride // min(cfg.backbone.fusion_strides)
            capz = min(fus.z_slab_cap * ratio, _round_up(P, 128))
            if fus.z_slab_cap_max is not None:
                capz = min(capz, _round_up(fus.z_slab_cap_max, 128))
            capr = min(fus.z_row_cap * ratio, capz)
            P_pad = max(_round_up(P, 128), capz)
            TH, H_eff, _, _, _ = _plane_geometry(
                H, W, r, fus.pallas_tile_rows)
            NS = H_eff // TH
            # the fused kernel's z1 slab is FEATURE-major bf16
            # ([B, hid, P_pad]: dynamic window slices must run along the
            # 128-aligned point/lane axis); transpose + cast + pad here
            # at the sampling boundary so XLA fuses them into one copy
            # instead of a separate HBM relayout inside every kernel
            # call (ADVICE r3)
            z1t = jnp.pad(jnp.transpose(z1.astype(jnp.bfloat16),
                                        (0, 2, 1)),
                          ((0, 0), (0, 0), (0, P_pad - P)))  # [B,hid,P_pad]
            if row_cum is not None:
                starts, rstarts, overflow = jax.vmap(
                    lambda cm: fusion_windows(None, NS, TH, r, ratio,
                                              capz, capr, P_pad,
                                              cum=cm))(row_cum)
            else:
                starts, rstarts, overflow = jax.vmap(
                    lambda fr: fusion_windows(fr, NS, TH, r, ratio, capz,
                                              capr, P_pad))(fine_row)
            # Overflowing points fall outside their row's z1 window and
            # would lose their fusion pairs; surface the count
            # (collected into train metrics by the loss fn; the debug
            # step checkify-raises on it instead of dropping silently).
            self.sow("diagnostics", "slab_overflow",
                     jnp.sum(overflow).astype(jnp.float32))
            acc = fused_fusion_planes(
                binned, z1t, starts, wgt, bg2, origin, cell, K, H, W,
                radius_cells=r, tile_rows=TH, capz=capz,
                interpret=fus.pallas_interpret, cascade=fus.cascade,
                slot_group=fus.cascade_slot_group, rstarts=rstarts,
                capr=capr)
        else:
            acc = fused_fusion_reference(binned, z1, wgt, bg2, origin,
                                         cell, K, radius_cells=r)

        # output layer: linear over the K-sum; the per-pair bias of the
        # paper's MLP is count * bias (kernel's last channel)
        wo = self.param("out_kernel", nn.initializers.lecun_normal(),
                        (hid, self.out_channels), jnp.float32)
        bo = self.param("out_bias", nn.initializers.zeros_init(),
                        (self.out_channels,), jnp.float32)
        h = (acc[..., :hid].astype(dtype) @ wo.astype(dtype)
             + acc[..., hid:].astype(dtype) * bo.astype(dtype))
        return h


def image_stride_for(bev_stride: int, cfg: Config) -> int:
    """BEV stride -> image pyramid stride (2 -> 4, 4 -> 8, 8 -> 16, 16 -> 32,
    clamped to available levels)."""
    return min(bev_stride * 2, 32)
