"""Bilinear feature sampling (SURVEY.md M3 step c, 2.4).

XLA gather-based bilinear interpolation of image features at projected
lidar locations — the TPU equivalent of the reference's `grid_sample`.
Out-of-bounds samples return zeros (and a validity flag), matching the
zero-padding border convention.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, uv: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample `feat` at continuous pixel locations.

    Args:
      feat: [H, W, C] feature map.
      uv: [..., 2] (u = column, v = row) in pixel units of `feat`.

    Returns:
      (values[..., C], inside[...]) — zeros and False outside [0, W/H - 1].
    """
    H, W, C = feat.shape
    u = uv[..., 0]
    v = uv[..., 1]
    inside = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)

    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    # One wide-row gather instead of four: TPU row gathers are per-row
    # overhead bound, so fetching each location's precomputed 2x2 patch
    # (4C-wide rows, built by cheap shifted pads) is ~4x faster than four
    # separate C-wide corner gathers.
    p01 = jnp.pad(feat[:, 1:], ((0, 0), (0, 1), (0, 0)))
    p10 = jnp.pad(feat[1:], ((0, 1), (0, 0), (0, 0)))
    p11 = jnp.pad(feat[1:, 1:], ((0, 1), (0, 1), (0, 0)))
    patch = jnp.concatenate([feat, p01, p10, p11], axis=-1)   # [H, W, 4C]
    rows = patch[v0i, u0i]                                    # [..., 4C]
    f00 = rows[..., 0 * C:1 * C]
    f01 = rows[..., 1 * C:2 * C]
    f10 = rows[..., 2 * C:3 * C]
    f11 = rows[..., 3 * C:4 * C]
    top = f00 * (1 - du) + f01 * du
    bot = f10 * (1 - du) + f11 * du
    out = top * (1 - dv) + bot * dv
    return jnp.where(inside[..., None], out, 0.0), inside
