"""Configuration system (SURVEY.md T7).

The reference repo (a PyTorch ContFuse reimplementation) drives everything
from argparse flags and in-file constant dicts; every magic number there
(ROI bounds, voxel size, anchor sizes, focal alpha/gamma, NMS thresholds)
gets a named field here so a future reference diff is a config diff.

All configs are frozen dataclasses: hashable, JSON-serializable, and safe to
close over inside a jitted function (static by construction -- TPU/XLA needs
static shapes, and every shape in the pipeline derives from these fields).

One factory per BASELINE.json config milestone lives at the bottom
(`lidar_only_config` ... `train_config`).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Tuple


def _round_to(x: float, step: float) -> int:
    return int(round(x / step))


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    """BEV rasterization region of interest + resolution (SURVEY.md D3).

    Defaults follow the PIXOR-style front-view KITTI crop the paper uses:
    x forward [0, 70.4) m, y left [-40, 40) m, z up [-3, 1) m, 0.1 m pixels,
    0.2 m height slices -> a (704, 800) pseudo-image with 20 occupancy
    channels + 1 mean-intensity channel.
    """

    x_min: float = 0.0
    x_max: float = 70.4
    y_min: float = -40.0
    y_max: float = 40.0
    z_min: float = -3.0
    z_max: float = 1.0
    voxel_size: float = 0.1
    z_slice_size: float = 0.2
    max_points: int = 24576  # static point capacity after ROI crop (pad/trunc)
    # Rasterizer decision (round 2, measured on v5e): the jnp
    # unique-indices sorted-scatter is the production rasterizer. A
    # Pallas matmul-scatter slab kernel was built and parity-tested in
    # round 1 but measured 3x SLOWER (1.89 vs 0.62 ms/frame at B=1 and
    # B=8) -- XLA's unique-scatter is already bandwidth-optimal here --
    # so it was retired (git history: dcf/ops/pallas/voxelize_kernel.py).

    @property
    def grid_x(self) -> int:  # rows of the BEV image (forward axis)
        return _round_to(self.x_max - self.x_min, self.voxel_size)

    @property
    def grid_y(self) -> int:  # cols of the BEV image (left-right axis)
        return _round_to(self.y_max - self.y_min, self.voxel_size)

    @property
    def num_z_slices(self) -> int:
        return _round_to(self.z_max - self.z_min, self.z_slice_size)

    @property
    def bev_channels(self) -> int:
        # occupancy per z-slice + mean intensity
        return self.num_z_slices + 1


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """One anchor family == one object class (SURVEY.md D6).

    Sizes are (dx, dy, dz) = (length along heading, width, height) in metres;
    KITTI community defaults (SECOND/PointPillars lineage).
    """

    name: str
    size: Tuple[float, float, float]
    z_center: float           # anchor box center height in lidar frame
    rotations: Tuple[float, ...] = (0.0, 1.5707963267948966)
    matched_threshold: float = 0.6
    unmatched_threshold: float = 0.45


CAR_ANCHOR = AnchorConfig("Car", (3.9, 1.6, 1.56), -1.0, matched_threshold=0.6,
                          unmatched_threshold=0.45)
PED_ANCHOR = AnchorConfig("Pedestrian", (0.8, 0.6, 1.73), -0.6,
                          matched_threshold=0.5, unmatched_threshold=0.35)
CYC_ANCHOR = AnchorConfig("Cyclist", (1.76, 0.6, 1.73), -0.6,
                          matched_threshold=0.5, unmatched_threshold=0.35)


@dataclasses.dataclass(frozen=True)
class ImageConfig:
    """Camera branch input geometry (SURVEY.md M1)."""

    height: int = 384   # KITTI images (~375 x 1242) are padded to this
    width: int = 1248
    channels: int = 3
    # Space-to-depth(4) the image on the HOST (prefetch pool): the
    # patchify stem's in-graph reshape + transpose materialized 0.38 ms
    # of HBM copies per frame at B=1 on v5e. The backbone accepts both
    # layouts, so hand-built [H, W, 3] batches keep working.
    host_s2d: bool = True


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Continuous fusion layer (SURVEY.md M3/M4, paper section 3.2)."""

    num_neighbors: int = 4        # K nearest lidar points per BEV pixel
    bin_capacity: int = 8         # max points stored per BEV-scale bin
    search_radius_cells: int = 1  # 3x3 neighborhood search
    hidden_dim: int = 64          # MLP hidden width
    # Fused per-scale Pallas fusion kernel on TPU (jnp twin if False)
    use_pallas: bool = True
    # KNN cascade variant inside the fused kernel: "onepass" (classic
    # insertion cascade, 20+ live vector arrays -> register spills) or
    # "twopass" (distance-only selection + slot placement, bounded live
    # state; identical selection, see fusion_kernel._cascade_twopass)
    cascade: str = "twopass"
    # slots materialized per pass-2 sweep (twopass only): trades sweep
    # count against live registers
    cascade_slot_group: int = 4
    # Run the fusion kernel in Pallas interpret mode (the kernel
    # "sanitizer", SURVEY.md 5.2) -- lets CPU tests exercise the real
    # kernel path incl. slab-overflow accounting; never set on TPU.
    pallas_interpret: bool = False
    pallas_tile_rows: int = 8     # BEV rows per kernel program (slab)
    # z1-table rows DMA'd per slab at the finest fusion scale; coarser
    # scales scale it by their stride ratio (their slabs span more rows).
    # Overflow (a slab's point range exceeding the cap) drops those
    # fusion pairs; it is surfaced as the `slab_overflow` train metric
    # and the debug step raises on it. 1536 measured overflow-free over
    # the 64-frame varied bench pool at every scale (2048 previously;
    # the backward's one-hot dz1 matmul work scales with this cap, so
    # smaller is faster).
    z_slab_cap: int = 1536
    # Hard ceiling on the scaled per-slab cap (None = uncapped). The
    # ratio scaling is worst-case generous at coarse scales (s16's slab
    # spans 23% of the fine rows but gets 8x the cap = half of
    # max_points); the cap bounds the backward's [hid, capz] dz1 block
    # and z1 slab scratch -- the s16 scoped-VMEM driver of the B=8
    # train OOM (BASELINE.md). Overflow reporting is unchanged.
    z_slab_cap_max: int | None = None
    # z1 one-hot window per BEV ROW inside the slab (fusion_windows): a
    # row only selects neighbors from (1 + 2r) of the slab's (TH + 2r)
    # fine-row span, so the kernel's dominant matmuls run this much
    # narrower than the slab. Scaled by stride ratio like z_slab_cap;
    # overflow folds into the same `slab_overflow` metric / debug check.
    z_row_cap: int = 512
    # Points arrive fine-grid row-major sorted from the HOST
    # (dcf.data.preprocess sorts inside the prefetch thread pool, off
    # the device critical path) and the detector skips its in-jit
    # argsort (~1.5 ms/frame of bitonic sort passes on v5e). The host
    # key is computed in float32 with the exact device arithmetic, so
    # order is bit-identical. Only set when every batch goes through
    # frame_to_example (tests feeding hand-built unsorted batches must
    # leave it False or pre-sort).
    host_sorted_points: bool = True
    # Per-scale binning ranks + the point projection computed on the
    # HOST too (dcf.data.preprocess.fusion_host_arrays): removes the
    # coarse-rank cumsum-image gathers + segmented scans from the
    # device forward (~2.5 ms/frame at B=1 on v5e). Rides
    # host_sorted_points (ranks index arrival order); batches without
    # the "fusion_rank"/"points_uvz" keys fall back to on-device
    # binning, so hand-built batches keep working.
    host_binned_ranks: bool = True
    # Geometric features fed to the MLP alongside image features are
    # fixed at 4 channels ((dx, dy) pixel-center offset + point z + bev
    # distance), hardcoded in the fusion kernel and its jnp twin.


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """BEV conv backbone + FPN (SURVEY.md M2) and image ResNet (M1)."""

    # channels of the four BEV residual stages (strides 2, 4, 8, 16)
    bev_stage_channels: Tuple[int, ...] = (64, 128, 192, 256)
    # image ResNet stage channels (strides 4, 8, 16, 32)
    image_stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    image_blocks_per_stage: Tuple[int, ...] = (2, 2, 2, 2)
    bev_blocks_per_stage: Tuple[int, ...] = (2, 2, 2, 2)
    fpn_channels: int = 128       # top-down merged channels at head stride
    head_stride: int = 4          # detection head runs at BEV stride 4
    # strides (relative to the BEV grid) at which continuous fusion happens
    fusion_strides: Tuple[int, ...] = (2, 4, 8, 16)
    dtype: str = "bfloat16"       # compute dtype (params stay float32)
    # int8 PTQ serving mode for every ConvNorm (dcf.models.layers /
    # dcf.quant): "off" (bf16, training + default serving), "calib"
    # (bf16 + record activation max-abs into the "quant" collection),
    # "int8" (serve a bf16-trained checkpoint with int8 x int8 -> int32
    # convs; v5e MXU doubles its rate at int8). AP delta must be gated
    # per checkpoint (scripts/generalization.py) before shipping int8.
    quant_mode: str = "off"


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Detection head / decode / NMS (SURVEY.md M5-M7)."""

    head_channels: int = 128
    num_convs: int = 2
    pre_nms_top_k: int = 256      # score prefilter before rotated NMS
    # exact_topk=True swaps the approx_max_k prefilter (recall 0.99,
    # hardware-accelerated) for an exact lax.top_k full sort -- the
    # flagged bit-parity mode for A/B runs against the reference
    exact_topk: bool = False
    nms_max_per_class: int = 64   # greedy NMS rounds per class
    nms_iou_threshold: float = 0.25
    score_threshold: float = 0.05
    max_detections: int = 128     # static output capacity (padded + mask)
    use_direction_classifier: bool = True


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Focal + smooth-L1 losses (SURVEY.md T1)."""

    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    cls_weight: float = 1.0
    reg_weight: float = 2.0
    dir_weight: float = 0.2
    smooth_l1_beta: float = 1.0 / 9.0


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Host-side augmentation (SURVEY.md D4/D5)."""

    flip_prob: float = 0.5
    gt_sampling: bool = True
    # max objects pasted per class per frame by gt-sampling
    gt_sample_max: Tuple[int, ...] = (15, 8, 8)
    # camera-consistent gt-sampling: paste the donor frame's projected
    # image patch at the pasted box's projection (far-to-near) so the
    # camera stream sees the pasted objects too (dcf/data/augment.py)
    gt_sample_image_paste: bool = True
    global_rotation: float = 0.78539816  # +/- pi/4 uniform yaw jitter
    global_scale: Tuple[float, float] = (0.95, 1.05)
    max_boxes: int = 64           # static gt-box capacity per frame


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / loop (SURVEY.md T2/T3)."""

    batch_size: int = 8
    # gradient accumulation: split each batch into accum_steps
    # micro-batches (lax.scan) -- bounds activation memory while keeping
    # EXACT full-batch gradients (see dcf.train.step.make_train_step)
    accum_steps: int = 1
    # Largest per-device micro-batch the train loop will compile without
    # accumulation (0 = no cap). The fusion backward kernel at the
    # coarsest scale exceeds the v5e's 16 MB scoped-VMEM limit when the
    # step compiles at B=8 (measured: 16.64 MB, "fusion_s16" scoped OOM)
    # while B=2 compiles fine, so single-shard training at the default
    # batch 8 auto-raises accum_steps to keep micro-batches at this size
    # (dcf.train.loop.train; exact full-batch gradients either way).
    # Multi-shard DP already reduces the per-device batch by itself.
    micro_batch_max: int = 2
    # When > 0, the train loop preloads this many loader batches onto
    # the device ONCE (augmentation drawn at build time) and cycles
    # them in a per-epoch-shuffled order instead of streaming fresh
    # host batches every step. Motivation (round 5): the tunneled TPU
    # client leaks ~100% of every host->device transfer's bytes in
    # host RAM (measured: an 11.5 MB/step batch stream grew RSS by
    # ~11 MB/step until OOM), so long runs must not stream; a resident
    # pool also removes the host data path from the step critical path.
    # Aug diversity = resident_batches * batch_size instances over the
    # dataset instead of fresh-per-epoch. 0 = stream (default).
    resident_batches: int = 0
    num_steps: int = 18560        # ~40 epochs of 3712 frames at batch 8
    learning_rate: float = 2e-3
    weight_decay: float = 1e-4
    warmup_steps: int = 300
    grad_clip_norm: float = 10.0
    checkpoint_every: int = 1000
    log_every: int = 50
    seed: int = 0
    # Exponential moving average of params, updated inside the jitted
    # step (TrainState.ema_params); 0.0 disables. Horizon ~1/(1-d)
    # steps: 0.999 averages the last ~1k steps, smoothing the LR-endgame
    # AP noise that made single-checkpoint eval unreliable (BASELINE.md
    # round-4 schedule row).
    ema_decay: float = 0.0
    # Target-assigner window, in head-stride cells per side. Coverage is
    # +-(window/2 * grid_cell) around the gt center cell; any anchor
    # whose rotated IoU with a KITTI-sized gt could cross the
    # pos/neg thresholds lies within ~+-4.6 m (half gt diagonal + half
    # anchor diagonal), so 24 cells (+-4.8 m at 0.4 m cells) preserves
    # dense-assigner semantics with 44% less clip + scatter work than
    # the conservative 32 (tests/test_nms_targets_losses.py checks both).
    assigner_window: int = 24


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level config threaded explicitly through the whole framework."""

    voxel: VoxelConfig = VoxelConfig()
    image: ImageConfig = ImageConfig()
    fusion: FusionConfig = FusionConfig()
    backbone: BackboneConfig = BackboneConfig()
    head: HeadConfig = HeadConfig()
    loss: LossConfig = LossConfig()
    augment: AugmentConfig = AugmentConfig()
    train: TrainConfig = TrainConfig()
    anchors: Tuple[AnchorConfig, ...] = (CAR_ANCHOR,)
    with_camera: bool = False     # camera branch on/off
    with_fusion: bool = False     # continuous fusion layers on/off
    # Pallas pairwise rotated-clip kernel for NMS / assigner IoUs
    # (resolved to False off-TPU by resolve_platform)
    pallas_clip: bool = True

    @property
    def num_classes(self) -> int:
        return len(self.anchors)

    @property
    def anchors_per_loc(self) -> int:
        return sum(len(a.rotations) for a in self.anchors)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        return _from_dict(cls, json.loads(text))


def _from_dict(klass: Any, data: Any) -> Any:
    if dataclasses.is_dataclass(klass) and isinstance(data, dict):
        fields = {f.name: f for f in dataclasses.fields(klass)}
        kwargs = {}
        for key, value in data.items():
            f = fields[key]
            ftype = f.type if not isinstance(f.type, str) else None
            kwargs[key] = _coerce_field(f, value)
        return klass(**kwargs)
    return data


_FIELD_TYPES = {
    "voxel": VoxelConfig, "image": ImageConfig, "fusion": FusionConfig,
    "backbone": BackboneConfig, "head": HeadConfig, "loss": LossConfig,
    "augment": AugmentConfig, "train": TrainConfig,
}


def _coerce_field(field: dataclasses.Field, value: Any) -> Any:
    if field.name in _FIELD_TYPES and isinstance(value, dict):
        return _from_dict(_FIELD_TYPES[field.name], value)
    if field.name == "anchors":
        return tuple(
            AnchorConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in a.items()})
            for a in value)
    if isinstance(value, list):
        return tuple(tuple(v) if isinstance(v, list) else v for v in value)
    return value


def resolve_platform(cfg: Config, platform: str = None) -> Config:
    """Resolve kernel-selection flags for the backend we will run on.

    Pallas kernels only compile on TPU; module bodies must not sniff
    `jax.devices()` at trace time (mis-selects under multi-backend
    processes and breaks CPU-driven AOT compiles), so selection happens
    here, once, at setup time. Every entry point (CLI, bench, graft entry,
    tiny_config for tests) routes its config through this.
    """
    if platform is None:
        import jax
        platform = jax.default_backend()
    on_tpu = platform == "tpu"
    keep_pallas = on_tpu or cfg.fusion.pallas_interpret
    return dataclasses.replace(
        cfg,
        fusion=dataclasses.replace(
            cfg.fusion, use_pallas=cfg.fusion.use_pallas and keep_pallas),
        pallas_clip=cfg.pallas_clip and on_tpu)


# --------------------------------------------------------------------------
# BASELINE.json config milestones (/root/repo/BASELINE.json:7-11)
# --------------------------------------------------------------------------

def lidar_only_config() -> Config:
    """Config 1: BEV pseudo-image + conv backbone + Car head, single frame."""
    return Config(anchors=(CAR_ANCHOR,), with_camera=False, with_fusion=False)


def camera_config() -> Config:
    """Config 2: adds the ResNet image backbone feature extraction."""
    return Config(anchors=(CAR_ANCHOR,), with_camera=True, with_fusion=False)


def fusion_single_scale_config() -> Config:
    """Config 3: single-scale continuous fusion, Car class."""
    return Config(
        anchors=(CAR_ANCHOR,), with_camera=True, with_fusion=True,
        backbone=BackboneConfig(fusion_strides=(4,)))


def multi_scale_config() -> Config:
    """Config 4: fusion at all backbone strides, 3 classes, rotated NMS."""
    return Config(
        anchors=(CAR_ANCHOR, PED_ANCHOR, CYC_ANCHOR),
        with_camera=True, with_fusion=True)


def train_config() -> Config:
    """Config 5: batched KITTI training with augmentation + losses on TPU."""
    return multi_scale_config()


def tiny_config(with_fusion: bool = True) -> Config:
    """A shrunk config for tests/CI: full architecture, small shapes."""
    voxel = VoxelConfig(x_max=25.6, y_min=-12.8, y_max=12.8, voxel_size=0.2,
                        max_points=2048)
    image = ImageConfig(height=96, width=320)
    backbone = BackboneConfig(
        bev_stage_channels=(16, 24, 32, 48),
        image_stage_channels=(8, 16, 24, 32),
        image_blocks_per_stage=(1, 1, 1, 1), bev_blocks_per_stage=(1, 1, 1, 1),
        fpn_channels=32, fusion_strides=(2, 4, 8, 16) if with_fusion else (4,))
    head = HeadConfig(head_channels=32, pre_nms_top_k=256, max_detections=32)
    fusion = FusionConfig(num_neighbors=2, bin_capacity=4, hidden_dim=16)
    return resolve_platform(Config(
        voxel=voxel, image=image, backbone=backbone, head=head, fusion=fusion,
        anchors=(CAR_ANCHOR, PED_ANCHOR, CYC_ANCHOR),
        augment=AugmentConfig(max_boxes=16),
        train=TrainConfig(batch_size=2, num_steps=10),
        with_camera=with_fusion, with_fusion=with_fusion))
