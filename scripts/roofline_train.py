"""Per-layer utilization-adjusted roofline for the train step (dev tool).

The pure roofline (total FLOPs / peak, total bytes / BW) hides WHY a
conv-heavy detector can't reach it: the v5e MXU is a 128x128 systolic
array, so a conv with Cout < 128 can occupy at most Cout/128 of the MXU's
output columns, and one with Cin*k*k < 128 at most (Cin*k*k)/128 of its
rows.  This script walks every conv in the flagship config, computes

  t_layer >= max( FLOPs / (peak * occ_N * occ_K),  bytes / BW )

with occ_N = min(Cout/128, 1), occ_K = min(Cin*k*k/128, 1), and sums the
per-layer floors (forward; backward counted as 2x forward with the same
occupancy: dgrad has the transposed-K occupancy, wgrad contracts over
B*H*W which is large, so its occupancy is taken as 1 on the K side and
Cout/128 x Cin/128 on the output side -- approximated here by the same
factor, erring OPTIMISTIC, i.e. the real floor is higher).

This is the quantitative argument the <=60 ms train-step target needs:
against the utilization-adjusted floor, not the raw-peak fantasy floor.
Model-math cuts that WOULD lift occupancy (wider early stages) were
measured to lose held-out AP (BASELINE.md round-3 fast-preset rows).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcf.config import multi_scale_config
from dcf.utils.flops import (V5E_HBM_BYTES_PER_S, V5E_PEAK_BF16_FLOPS,
                             inference_bytes_per_frame,
                             inference_flops_per_frame)

MXU = 128
BPE = 2  # bf16


def conv_floor(h, w, cin, cout, k, batch, rows):
    """Per-conv forward floor (ms) + bookkeeping row."""
    flops = 2 * h * w * cin * cout * k * k * batch
    occ_n = min(cout / MXU, 1.0)
    occ_k = min(cin * k * k / MXU, 1.0)
    eff_peak = V5E_PEAK_BF16_FLOPS * occ_n * occ_k
    t_c = flops / eff_peak
    bytes_ = (h * w * cin * (k * k > 1 and 1 or 1)  # input read (approx)
              + h * w * cout) * BPE * batch + cin * cout * k * k * 4
    t_m = bytes_ / V5E_HBM_BYTES_PER_S
    rows.append((h, w, cin, cout, k, flops / 1e9, occ_n * occ_k,
                 max(t_c, t_m) * 1e3))
    return max(t_c, t_m)


def walk_convs(cfg, batch):
    rows = []
    t = 0.0
    bb = cfg.backbone
    # BEV backbone
    h, w = cfg.voxel.grid_x, cfg.voxel.grid_y
    cin = cfg.voxel.bev_channels
    for stage, cout in enumerate(bb.bev_stage_channels):
        h, w = h // 2, w // 2
        t += conv_floor(h, w, cin, cout, 3, batch, rows)
        t += conv_floor(h, w, cout, cout, 3, batch, rows)
        t += conv_floor(h, w, cin, cout, 1, batch, rows)  # shortcut
        for _ in range(bb.bev_blocks_per_stage[stage] - 1):
            t += conv_floor(h, w, cout, cout, 3, batch, rows)
            t += conv_floor(h, w, cout, cout, 3, batch, rows)
        cin = cout
    # image backbone
    if cfg.with_camera:
        ih, iw = cfg.image.height // 2, cfg.image.width // 2
        t += conv_floor(ih, iw, cfg.image.channels,
                        bb.image_stage_channels[0], 7, batch, rows)
        ih, iw = ih // 2, iw // 2
        cin = bb.image_stage_channels[0]
        for stage, cout in enumerate(bb.image_stage_channels):
            if stage > 0:
                ih, iw = ih // 2, iw // 2
            t += conv_floor(ih, iw, cin, cout, 3, batch, rows)
            t += conv_floor(ih, iw, cout, cout, 3, batch, rows)
            if stage > 0:
                t += conv_floor(ih, iw, cin, cout, 1, batch, rows)
            for _ in range(bb.image_blocks_per_stage[stage] - 1):
                t += conv_floor(ih, iw, cout, cout, 3, batch, rows)
                t += conv_floor(ih, iw, cout, cout, 3, batch, rows)
            cin = cout
    # FPN + head
    hh = cfg.voxel.grid_x // bb.head_stride
    ww = cfg.voxel.grid_y // bb.head_stride
    t += conv_floor(hh, ww, bb.fpn_channels, bb.fpn_channels, 3, batch, rows)
    cin = bb.fpn_channels
    for _ in range(cfg.head.num_convs):
        t += conv_floor(hh, ww, cin, cfg.head.head_channels, 3, batch, rows)
        cin = cfg.head.head_channels
    A = cfg.anchors_per_loc
    out_ch = A + A * 7 + (A * 2 if cfg.head.use_direction_classifier else 0)
    t += conv_floor(hh, ww, cin, out_ch, 1, batch, rows)
    return t, rows


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = multi_scale_config()
    fwd_conv_s, rows = walk_convs(cfg, B)

    fl = inference_flops_per_frame(cfg)
    by = inference_bytes_per_frame(cfg)
    raw_fwd_c = fl["total"] * B / V5E_PEAK_BF16_FLOPS
    raw_fwd_m = by * B / V5E_HBM_BYTES_PER_S

    print(f"=== utilization-adjusted conv floors, B={B} (fwd) ===")
    rows.sort(key=lambda r: -r[-1])
    print(f"{'HxW':>12} {'Cin':>4} {'Cout':>4} k {'GFLOP':>8} "
          f"{'occ':>5} {'floor ms':>9}")
    for h, w, cin, cout, k, gf, occ, ms in rows[:12]:
        print(f"{h:>6}x{w:<5} {cin:>4} {cout:>4} {k} {gf:>8.2f} "
              f"{occ:>5.2f} {ms:>9.3f}")
    tot_fwd = fwd_conv_s * 1e3
    # backward: dgrad + wgrad ~ 2x forward work at (approximately) the
    # same occupancy -- optimistic, see module docstring
    tot_train_conv = 3 * tot_fwd
    print(f"\nconv fwd floor (occupancy-adjusted): {tot_fwd:.2f} ms "
          f"(raw-peak: {raw_fwd_c*1e3:.2f} ms)")
    print(f"conv train floor (3x fwd):           {tot_train_conv:.2f} ms")
    print(f"memory floor fwd (est. bytes):       {raw_fwd_m*1e3:.2f} ms; "
          f"train ~3x = {3*raw_fwd_m*1e3:.2f} ms")
    floor = max(tot_train_conv, 3 * raw_fwd_m * 1e3)
    print(f"\n=> train-step floor at B={B}: ~{floor:.1f} ms "
          f"(convs alone, before fusion kernel / targets / optimizer)")


if __name__ == "__main__":
    main()
