"""KITTI calibration and camera projection (SURVEY.md D2).

Host side: `Calibration` parses KITTI `calib/*.txt` into numpy matrices and
offers the velo <-> rect <-> image chain needed by the data layer (label
conversion, gt-sampling, flip augmentation).

Device side: the whole chain collapses into one 3x4 homogeneous matrix
``M = P2 @ R0 @ Tr_velo_to_cam`` which is the only calibration the jitted
model ever sees; `project_velo_to_image` applies it in jnp. This keeps the
fusion layer's projection a single matmul that XLA fuses into the
continuous-fusion kernel (SURVEY.md 3.4 step 2).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


def _to4x4(mat: np.ndarray) -> np.ndarray:
    out = np.eye(4, dtype=np.float64)
    out[:mat.shape[0], :mat.shape[1]] = mat
    return out


class Calibration:
    """KITTI per-frame calibration.

    Frames: `velo` lidar (x fwd, y left, z up); `rect` rectified camera
    (x right, y down, z fwd); `image` pixel (u right, v down).
    """

    def __init__(self, P2: np.ndarray, R0: np.ndarray,
                 Tr_velo_to_cam: np.ndarray):
        self.P2 = np.asarray(P2, np.float64).reshape(3, 4)
        self.R0 = _to4x4(np.asarray(R0, np.float64).reshape(3, 3))
        self.V2C = _to4x4(np.asarray(Tr_velo_to_cam, np.float64).reshape(3, 4))
        self.C2V = np.linalg.inv(self.V2C)
        self.R0_inv = np.linalg.inv(self.R0)

    # -- parsing -----------------------------------------------------------

    @classmethod
    def from_kitti_calib_file(cls, path: str) -> "Calibration":
        fields = cls._parse(path)
        return cls(fields["P2"], fields["R0_rect"], fields["Tr_velo_to_cam"])

    @staticmethod
    def _parse(path: str) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        with open(path, "r") as f:
            for line in f:
                line = line.strip()
                if not line or ":" not in line:
                    continue
                key, vals = line.split(":", 1)
                out[key.strip()] = np.array(
                    [float(v) for v in vals.split()], np.float64)
        return out

    @classmethod
    def identity(cls, fu: float = 700.0, fv: float = 700.0,
                 cu: float = 620.0, cv: float = 190.0) -> "Calibration":
        """Synthetic calibration for tests: velo->rect is the canonical
        axis permutation (x_c = -y_v, y_c = -z_v, z_c = x_v), pinhole P2."""
        P2 = np.array([[fu, 0, cu, 0], [0, fv, cv, 0], [0, 0, 1, 0]],
                      np.float64)
        Tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]],
                      np.float64)
        return cls(P2, np.eye(3), Tr)

    # -- transforms (all numpy, [N, 3] in / [N, k] out) --------------------

    @staticmethod
    def _homo(pts: np.ndarray) -> np.ndarray:
        return np.concatenate(
            [pts, np.ones((*pts.shape[:-1], 1), pts.dtype)], axis=-1)

    def velo_to_rect(self, pts: np.ndarray) -> np.ndarray:
        return (self._homo(pts) @ (self.R0 @ self.V2C).T)[..., :3]

    def rect_to_velo(self, pts: np.ndarray) -> np.ndarray:
        return (self._homo(pts) @ (self.C2V @ self.R0_inv).T)[..., :3]

    def rect_to_image(self, pts: np.ndarray) -> np.ndarray:
        """[N, 3] rect -> [N, 3] (u, v, depth)."""
        uvw = self._homo(pts) @ self.P2.T
        depth = uvw[..., 2:3]
        return np.concatenate(
            [uvw[..., :2] / np.clip(depth, 1e-6, None), depth], axis=-1)

    def velo_to_image(self, pts: np.ndarray) -> np.ndarray:
        return self.rect_to_image(self.velo_to_rect(pts))

    @property
    def velo_to_image_matrix(self) -> np.ndarray:
        """The single 3x4 matrix the device-side model consumes."""
        return (self.P2 @ self.R0 @ self.V2C).astype(np.float32)

    def flip_horizontal(self, image_width: int) -> "Calibration":
        """Calibration consistent with (a) mirroring the image about its
        vertical axis and (b) negating y in the velo frame.

        u' = (W - 1) - u must hold for the flipped point cloud, which is
        achieved by composing: mirror_image @ P2 @ R0 @ V2C @ mirror_velo_y.
        mirror_velo_y is folded into V2C, mirror_image into P2, so the
        returned object still factors as (P2', R0, V2C').
        """
        mirror_img = np.array(
            [[-1, 0, image_width - 1.0], [0, 1, 0], [0, 0, 1]], np.float64)
        mirror_velo = np.diag([1.0, -1.0, 1.0, 1.0])
        P2 = mirror_img @ self.P2
        V2C = (self.V2C @ mirror_velo)[:3]
        return Calibration(P2, self.R0[:3, :3], V2C)


def project_velo_to_image(points: jnp.ndarray,
                          velo_to_image: jnp.ndarray) -> jnp.ndarray:
    """Device-side projection (SURVEY.md 3.4 step 2).

    Args:
      points: [..., 3] lidar-frame points.
      velo_to_image: [3, 4] combined projection matrix.

    Returns:
      [..., 3] of (u, v, depth); depth <= 0 means behind the camera.

    The matmul runs at Precision.HIGHEST: the MXU's DEFAULT precision
    is bf16 passes, which costs ~0.5 px of projection accuracy on TPU
    (measured) and breaks the host/device uvz parity tests on any
    backend that honors DEFAULT (XLA:CPU on AMX machines included).
    HIGHEST keeps the dot in f32, which on XLA:CPU matches the host
    twin's numpy BLAS sgemm bit-for-bit (asserted by the parity tests;
    an elementwise formulation does NOT match under jit because XLA
    contracts mul+add chains into FMAs).
    """
    uvw = jnp.matmul(points, velo_to_image[:, :3].T,
                     precision=jax.lax.Precision.HIGHEST) \
        + velo_to_image[:, 3]
    depth = uvw[..., 2:3]
    uv = uvw[..., :2] / jnp.maximum(jnp.abs(depth), 1e-6) * jnp.sign(depth)
    return jnp.concatenate([uv, depth], axis=-1)
