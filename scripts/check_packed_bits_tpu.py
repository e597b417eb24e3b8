"""On-TPU bit-exactness probe for the packed plane words (ADVICE r4 low).

The _D=2 plane layout stores validity in the low 16 bits of an f32 word
whose high bits are bf16(z) (`fusion_kernel._pack_zg`) and packs bf16
cell-center offsets the same way (`_pack_xy`). When bf16(z) == +-0 (z
exactly 0.0 is common: ground returns, padded slots) the packed word is
an f32 *denormal* -- any flush-to-zero or NaN-canonicalizing pass on the
real chip would silently drop those points' validity. Interpret-mode CPU
parity cannot catch hardware bit semantics, so this drives the REAL
kernel on the TPU with adversarial payloads (z == +0.0 / -0.0 / values
rounding to bf16 zero) and checks the fused output against the jnp twin
computed on CPU, to the parity suite's tolerance.

Run: python scripts/check_packed_bits_tpu.py    (needs the axon TPU;
add --interpret to smoke the same flow on CPU first)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dcf.ops.knn import bin_points_dense
from dcf.ops.pallas.fusion_kernel import (fused_fusion,
                                          fused_fusion_reference,
                                          fusion_windows)


def main():
    interpret = "--interpret" in sys.argv
    dev = jax.devices()[0]
    if not interpret:
        assert dev.platform != "cpu", f"needs the TPU, got {dev}"
    H, W, cap, K, hid, P = 32, 128, 4, 2, 16, 512
    rng = np.random.default_rng(0)
    pts = np.zeros((P, 4), np.float32)
    pts[:, 0] = rng.uniform(-1, H + 1, P)
    pts[:, 1] = rng.uniform(-1, W + 1, P)
    # adversarial z: every packed word in these rows is an f32 denormal
    z = rng.uniform(-2, 2, P).astype(np.float32)
    z[0::4] = 0.0
    z[1::4] = -0.0
    z[2::4] = 1e-41                       # f32 subnormal; bf16 -> 0
    pts[:, 2] = z
    mask = rng.uniform(size=P) < 0.9
    ix = np.floor(pts[:, 0]).astype(np.int64)
    iy = np.floor(pts[:, 1]).astype(np.int64)
    inb = mask & (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)
    key = np.where(inb, ix * W + iy, H * W)
    order = np.argsort(key, kind="stable")
    pts, mask = pts[order], mask[order]
    fine_row = np.where(inb, ix, 1 << 20)[order]
    pts[:, 3] = np.arange(P)

    bins = bin_points_dense(jnp.asarray(pts), jnp.asarray(mask),
                            (0.0, 0.0), 1.0, (H, W), cap)
    bbins = jax.tree.map(lambda x: x[None], bins)
    z1 = jnp.asarray(rng.normal(size=(1, P, hid)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(size=(hid, 4)) * 0.3, jnp.float32)
    bg = jnp.asarray(rng.normal(size=(hid, 1)) * 0.1, jnp.float32)
    TH, capz, capr = 8, 384, 256
    NS = (H + TH - 1) // TH
    starts, rstarts, overflow = fusion_windows(
        jnp.asarray(fine_row), NS, TH, 1, 1, capz, capr, P)
    assert int(jnp.max(overflow)) == 0

    ref = np.asarray(fused_fusion_reference(
        bbins, z1, wgt, bg, (0.0, 0.0), 1.0, K, 1))
    got = np.asarray(jax.device_get(fused_fusion(
        bbins, z1, starts[None], wgt, bg, (0.0, 0.0), 1.0, K,
        radius_cells=1, tile_rows=TH, capz=capz, interpret=interpret,
        rstarts=rstarts[None], capr=capr)))

    diff = np.abs(got - ref)
    bad = int((diff > 1e-5).sum())
    n_adv = int(np.sum(np.abs(pts[mask, 2]) < 1e-38))
    print(f"adversarial denormal-word points in play: {n_adv} / "
          f"{int(mask.sum())}")
    print(f"max abs diff vs twin: {diff.max():.3e}; elements > 1e-5: "
          f"{bad} / {diff.size}")
    # the count channel exposes validity loss directly: flushed words
    # read as empty slots and the per-pixel neighbor count drops
    cnt_diff = int(np.sum(got[..., -1] != ref[..., -1]))
    print(f"neighbor-count channel mismatches: {cnt_diff}")
    if bad == 0 and cnt_diff == 0:
        print("PASS: packed denormal words survive real-chip semantics")
    else:
        print("FAIL: flush-to-zero or canonicalization corrupted the "
              "packed planes")
        sys.exit(1)


if __name__ == "__main__":
    main()
