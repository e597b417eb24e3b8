"""End-to-end CLI integration over an on-disk KITTI tree (SURVEY.md L6).

Exercises the exact user workflow against a real directory layout:
materialize synthetic frames as a KITTI tree, build the gt-sampling db,
train (with gt-db + augmentation), resume from the checkpoint, then
evaluate and write KITTI-format results -- all through the argparse
entry points, nothing called directly.
"""

import json
import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("DCF_SLOW_TESTS"),
    reason="multi-CLI integration (set DCF_SLOW_TESTS=1; ~3 min)")


def test_full_cli_workflow_over_kitti_tree(tmp_path, capsys):
    from dcf.data.synthetic import write_kitti_tree

    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_frames=3, split="train")
    # val split over the same frames (ids only; the reader re-parses)
    with open(os.path.join(root, "ImageSets", "val.txt"), "w") as f:
        f.write("000000\n000001\n")

    db_path = str(tmp_path / "gt_db.pkl")
    from dcf.cli import build_gt_db
    build_gt_db.main(["--data-root", root, "--out", db_path,
                      "--min-points", "1", "--platform", "cpu"])
    assert os.path.exists(db_path)

    workdir = str(tmp_path / "run")
    from dcf.cli import train as train_cli
    train_cli.main(["--config", "tiny", "--data-root", root,
                    "--workdir", workdir, "--steps", "2",
                    "--gt-db", db_path, "--platform", "cpu"])
    ckpt_dir = os.path.join(workdir, "checkpoints")
    first = sorted(os.listdir(ckpt_dir))
    assert any(f.startswith("ckpt_") for f in first)

    # resume continues from step 2 -> step 4
    train_cli.main(["--config", "tiny", "--data-root", root,
                    "--workdir", workdir, "--steps", "4", "--resume",
                    "--gt-db", db_path, "--platform", "cpu"])
    from dcf.train import checkpoint as ckpt
    latest = ckpt.latest_checkpoint(ckpt_dir)
    assert latest.endswith("ckpt_00000004.msgpack")

    results_dir = str(tmp_path / "results")
    from dcf.cli import evaluate as eval_cli
    capsys.readouterr()
    eval_cli.main(["--workdir", workdir, "--data-root", root,
                   "--split", "val", "--results-dir", results_dir,
                   "--num-points", "0", "--platform", "cpu"])
    out = capsys.readouterr().out
    results = json.loads(out[out.index("{"):])
    assert "Car_3d_moderate" in results and "Car_bev_moderate" in results
    # KITTI-format result txts for every val frame
    assert sorted(os.listdir(results_dir)) == ["000000.txt", "000001.txt"]
    for fname in os.listdir(results_dir):
        with open(os.path.join(results_dir, fname)) as f:
            for line in f:
                parts = line.split()
                if parts:
                    assert len(parts) == 16   # KITTI result format
