"""dcf-tpu: Deep Continuous Fusion for multi-sensor 3D object detection,
TPU-native (JAX / XLA / Flax / Pallas).

A from-scratch framework with the capabilities of the PyTorch ContFuse
reimplementation class (see SURVEY.md): KITTI data + calibration, BEV
voxelization, camera + BEV backbones, per-scale continuous fusion
(grid-hash KNN + calibrated projection + bilinear gather + offset MLP),
detection head, on-device anchor decode and rotated NMS, losses, target
assignment, training/eval loops, data-parallel meshes, and a native C++
host core -- raw frame in, 3D boxes out, no host round-trips.

Entry points:
  dcf.config                  configuration (one factory per capability)
  dcf.models.detector         the ContFuseDetector module
  dcf.eval.inference          jitted end-to-end inference
  dcf.train.loop              training orchestration
  dcf.cli.{train,evaluate,demo,build_gt_db}   command-line tools
"""

__version__ = "0.1.0"
