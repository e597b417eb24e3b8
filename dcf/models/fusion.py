"""Continuous fusion layer (SURVEY.md M3/M4 — the core novelty of ContFuse).

Per BEV pixel at each backbone scale (paper section 3.2, SURVEY.md 3.4):
  1. K nearest lidar points in the BEV plane      (grid-hash KNN, static)
  2. project each point through calib into the image plane
  3. bilinearly interpolate image features there
  4. concat the 3D geometric offset (point - target pixel)
  5. shared MLP, masked sum over K -> a BEV feature map added to the stream

Steps 1-4 are parameter-free jnp vmapped per frame; the MLP is a shared
Dense stack applied batched. On TPU the KNN selection (the hot core) runs
as the Pallas streaming kernel `dcf.ops.pallas.knn_kernel` (BASELINE.json:5,
`fusion.use_pallas`); the jnp twin in dcf.ops.knn is the parity reference
and the CPU path.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from dcf.config import Config
from dcf.geometry.transforms import project_velo_to_image
from dcf.ops.bilinear import bilinear_sample
from dcf.ops.knn import bin_points_dense, knn_select_dense


class ContinuousFusionLayer(nn.Module):
    """One fusion layer at a fixed BEV stride / image stride pair."""

    cfg: Config
    out_channels: int
    bev_stride: int
    image_stride: int

    @nn.compact
    def __call__(self, points: jnp.ndarray, mask: jnp.ndarray,
                 velo_to_image: jnp.ndarray, image_feat: jnp.ndarray
                 ) -> jnp.ndarray:
        """Args:
          points: [B, P, 4] padded lidar points (x, y, z, intensity).
          mask: [B, P] validity.
          velo_to_image: [B, 3, 4] combined projection matrices.
          image_feat: [B, Hf, Wf, C] image features at `image_stride`.

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
        dtype = jnp.dtype(cfg.backbone.dtype)

        def prepare(pts, msk, proj, ifeat):
            P = pts.shape[0]
            # Image features are sampled once per *point* (P rows), not per
            # (pixel, neighbor) pair (H*W*K rows, ~20x more): each point
            # projects to a single image location, so the per-pair work
            # reduces to a small-table row gather after KNN selection.
            uvz = project_velo_to_image(pts[:, :3], proj)       # [P, 3]
            in_front = uvz[..., 2] > 0.1
            pfeat, inside = bilinear_sample(
                ifeat, uvz[..., :2] / float(self.image_stride))  # [P, C]
            img_ok = in_front & inside                           # [P]

            # bin payload: (x, y, z, point index as f32 -- exact to 2^24)
            payload = jnp.concatenate(
                [pts[:, :3],
                 jnp.arange(P, dtype=jnp.float32)[:, None]], axis=-1)
            bins = bin_points_dense(payload, msk, origin, cell, (H, W),
                                    fus.bin_capacity)
            return bins, pfeat, img_ok

        bins, pfeat, img_ok = jax.vmap(prepare)(points, mask,
                                                velo_to_image, image_feat)

        on_tpu = jax.devices()[0].platform not in ("cpu",)
        if fus.use_pallas and on_tpu:
            from dcf.ops.pallas.knn_kernel import knn_select_pallas
            nbr, nvalid, d2 = knn_select_pallas(
                bins, origin, cell, K, fus.search_radius_cells,
                tile_rows=fus.pallas_tile_rows)      # [B, H, W, K, ...]
        else:
            nbr, nvalid, d2 = jax.vmap(
                lambda b: knn_select_dense(b, origin, cell, K,
                                           fus.search_radius_cells))(bins)
        B = points.shape[0]
        nbr = nbr.reshape(B, H * W, K, 4)
        nvalid = nvalid.reshape(B, H * W, K)
        d2 = d2.reshape(B, H * W, K)
        idx = nbr[..., 3].astype(jnp.int32)                      # [B, HW, K]
        valid = nvalid & jax.vmap(lambda o, i: o[i])(img_ok, idx)

        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        cx = origin[0] + (rows.astype(jnp.float32) + 0.5) * cell
        cy = origin[1] + (cols.astype(jnp.float32) + 0.5) * cell
        cxy = jnp.stack([cx, cy], -1).reshape(1, H * W, 1, 2)
        geo = jnp.concatenate(
            [nbr[..., :2] - cxy, nbr[..., 2:3],
             jnp.sqrt(jnp.minimum(d2, 1e6))[..., None]], axis=-1)
        # The first MLP layer is split: its image-feature half is applied
        # per *point* before the per-pair gather, so the gather moves
        # hidden_dim-wide rows instead of C_img-wide ones (2-8x narrower at
        # the coarse scales), and the geometric half is added per pair.
        z1 = nn.Dense(fus.hidden_dim, use_bias=False, dtype=dtype,
                      param_dtype=jnp.float32,
                      name="img_proj")(pfeat.astype(dtype))   # [B, P, hid]
        z1g = jax.vmap(lambda z, i: z[i])(z1, idx)            # [B, HW, K, h]
        g1 = nn.Dense(fus.hidden_dim, dtype=dtype, param_dtype=jnp.float32,
                      name="geo_proj")(geo.astype(dtype))
        h = nn.relu(z1g + g1)
        h = nn.Dense(self.out_channels, dtype=dtype,
                     param_dtype=jnp.float32)(h)
        h = jnp.where(valid[..., None], h, 0.0)
        h = jnp.sum(h, axis=2)                               # over K
        B = points.shape[0]
        return h.reshape(B, H, W, self.out_channels)


def image_stride_for(bev_stride: int, cfg: Config) -> int:
    """BEV stride -> image pyramid stride (2 -> 4, 4 -> 8, 8 -> 16, 16 -> 32,
    clamped to available levels)."""
    return min(bev_stride * 2, 32)
