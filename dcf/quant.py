"""int8 post-training-quantization serving mode (PTQ).

The reference lineage serves fp32/fp16 on GPU; on TPU v5e the MXU doubles
its rate at int8 (394 TOPS vs 197 TFLOP/s bf16), so a PTQ mode is the
idiomatic way to spend the hardware. Design (dcf.models.layers.ConvNorm):

  - every ConvNorm conv can run in one of three static modes
    (BackboneConfig.quant_mode): "off" (bf16), "calib" (bf16 + record the
    running max-abs of each conv input into the mutable "quant"
    collection), "int8" (symmetric per-tensor activation / per-out-channel
    weight int8, int32 accumulation, exact dequant);
  - the float param tree is SHARED: scales live in the separate "quant"
    collection, so a bf16-trained checkpoint serves quantized without any
    conversion step;
  - GroupNorm, the fusion layers, and the head's 1x1 output convs stay
    bf16/fp32 -- the conv stacks are where the MXU time is.

Flow:
    qvars = calibrate(cfg, params, calib_batches)
    int8_model = ContFuseDetector(quant_config(cfg))
    preds = int8_model.apply({"params": params["params"], **qvars}, batch)

Ship-gating: PTQ changes numerics; hold-out AP must be re-measured per
checkpoint (scripts/generalization.py) before the int8 mode is used.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable

import jax

from dcf.config import Config


def quant_config(cfg: Config, mode: str = "int8") -> Config:
    """Config copy with every ConvNorm in `mode`."""
    return dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, quant_mode=mode))


def calibrate(cfg: Config, params: Dict, batches: Iterable[Dict],
              jit: bool = True) -> Dict:
    """Run calibration batches through the bf16 model, returning the
    {"quant": ...} collection of per-conv activation max-abs scales.

    Args:
      params: the trained variables dict ({"params": ...}).
      batches: iterable of batch dicts (device arrays).
    """
    from dcf.models.detector import ContFuseDetector

    model = ContFuseDetector(quant_config(cfg, "calib"))
    p = params["params"] if "params" in params else params

    def step(quant, batch):
        variables = {"params": p}
        if quant is not None:
            variables["quant"] = quant
        _, updated = model.apply(variables, batch, mutable=["quant"])
        return updated["quant"]

    step_j = jax.jit(step) if jit else step
    quant = None
    for batch in batches:
        quant = step_j(quant, batch)
    if quant is None:
        raise ValueError("calibrate() needs at least one batch")
    return {"quant": quant}
