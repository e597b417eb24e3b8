"""Shared CLI plumbing (SURVEY.md L6)."""

from __future__ import annotations

import argparse
from typing import List

from dcf import config as cfgmod
from dcf.config import Config

CONFIGS = {
    "lidar": cfgmod.lidar_only_config,        # BASELINE config 1
    "camera": cfgmod.camera_config,           # BASELINE config 2
    "fusion1": cfgmod.fusion_single_scale_config,   # BASELINE config 3
    "full": cfgmod.multi_scale_config,        # BASELINE configs 4/5
    "tiny": cfgmod.tiny_config,               # CI-sized full architecture
}


def config_by_name(name: str) -> Config:
    return cfgmod.resolve_platform(CONFIGS[name]())


class SyntheticDataset:
    """List-like dataset of deterministic synthetic frames (demo / smoke
    training when no KITTI download exists in this environment)."""

    def __init__(self, num_frames: int = 16):
        self.num_frames = num_frames

    def __len__(self) -> int:
        return self.num_frames

    def __getitem__(self, i: int):
        from dcf.data.synthetic import make_frame
        return make_frame(frame_id=f"{i:06d}", seed=i)


def add_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data-root", default=None,
                   help="KITTI object root (training/velodyne etc.)")
    p.add_argument("--split", default="train")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="use N synthetic frames instead of KITTI data")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax backend (the JAX_PLATFORMS env var "
                        "is latched before CLI code runs when a site "
                        "hook pre-registers a backend)")


def apply_platform(args) -> None:
    """Honor --platform before any jax computation happens."""
    if getattr(args, "platform", None):
        import jax
        from jax.extend import backend as jax_ext_backend
        jax.config.update("jax_platforms", args.platform)
        jax_ext_backend.clear_backends()


def resolve_dataset(args):
    if args.synthetic:
        return SyntheticDataset(args.synthetic)
    if not args.data_root:
        raise SystemExit("need --data-root or --synthetic N")
    from dcf.data.kitti import KittiDataset
    return KittiDataset(args.data_root, split=args.split)
