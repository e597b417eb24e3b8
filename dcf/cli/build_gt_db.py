"""Offline gt-sampling database builder (SURVEY.md D5).

    python -m dcf.cli.build_gt_db --data-root /data/kitti --split train \
        --out runs/gt_db.pkl
"""

from __future__ import annotations

import argparse

from dcf.cli.common import add_data_args, resolve_dataset


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--min-points", type=int, default=8)
    add_data_args(p)
    args = p.parse_args(argv)
    from dcf.cli.common import apply_platform
    apply_platform(args)

    from dcf.data.augment import GTDatabase
    dataset = resolve_dataset(args)
    frames = (dataset[i] for i in range(len(dataset)))
    db = GTDatabase.build(frames, min_points=args.min_points)
    db.save(args.out)
    counts = {k: len(v) for k, v in db.db.items()}
    print(f"wrote {args.out}: {counts}")


if __name__ == "__main__":
    main()
