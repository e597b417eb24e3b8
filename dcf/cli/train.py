"""Training entry point (SURVEY.md L6 / T2).

    python -m dcf.cli.train --config full --data-root /data/kitti \
        --workdir runs/full [--gt-db runs/gt_db.pkl] [--resume]
    python -m dcf.cli.train --config tiny --synthetic 8 --steps 20
"""

from __future__ import annotations

import argparse

from dcf.cli.common import add_data_args, config_by_name, resolve_dataset


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="full",
                   choices=["lidar", "camera", "fusion1", "full", "tiny"])
    p.add_argument("--workdir", default="runs/default")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--gt-db", default=None,
                   help="gt-sampling database pickle (dcf.cli.build_gt_db)")
    p.add_argument("--data-shards", type=int, default=None,
                   help="data-parallel shards (default: all devices)")
    p.add_argument("--debug", action="store_true",
                   help="run the step under checkify (NaN/OOB checks)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host: coordinator address (or set "
                        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                        "JAX_PROCESS_ID; on TPU pods auto-detected)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    add_data_args(p)
    args = p.parse_args(argv)
    from dcf.cli.common import apply_platform
    apply_platform(args)
    if args.coordinator or args.num_processes is not None:
        from dcf.parallel.mesh import initialize_distributed
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    cfg = config_by_name(args.config)
    dataset = resolve_dataset(args)
    gt_db = None
    if args.gt_db:
        from dcf.data.augment import GTDatabase
        gt_db = GTDatabase.load(args.gt_db)

    from dcf.train.loop import train
    train(cfg, dataset, args.workdir, gt_db=gt_db, resume=args.resume,
          num_steps=args.steps, num_data_shards=args.data_shards,
          debug=args.debug)


if __name__ == "__main__":
    main()
