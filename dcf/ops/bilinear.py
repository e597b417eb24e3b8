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
    H, W, _ = feat.shape
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
    u1i = jnp.minimum(u0i + 1, W - 1)
    v1i = jnp.minimum(v0i + 1, H - 1)

    f00 = feat[v0i, u0i]
    f01 = feat[v0i, u1i]
    f10 = feat[v1i, u0i]
    f11 = feat[v1i, u1i]
    top = f00 * (1 - du) + f01 * du
    bot = f10 * (1 - du) + f11 * du
    out = top * (1 - dv) + bot * dv
    return jnp.where(inside[..., None], out, 0.0), inside
