"""Torch-CPU oracle implementations (SURVEY.md 4.2).

Independent reimplementations of the framework's numerical components in
torch/numpy, used to validate the JAX/Pallas implementations to
tolerance. They stand in for diffing against the reference PyTorch repo
(whose checkout is empty -- SURVEY.md 0) and become a direct reference
A/B harness the moment it mounts.
"""
