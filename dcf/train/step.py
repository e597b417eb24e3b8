"""The jitted training step (SURVEY.md T2, 3.1).

Everything from the padded raw batch onward happens on device in one jit:
voxelization, both backbones, fusion, head, target assignment, losses,
optimizer update. The host only feeds batches (SURVEY.md 3.1 "TPU design
consequence": the H2D copy is the *only* boundary).

Data parallelism (SURVEY.md 2.5): the step is jit-compiled over a
`jax.sharding.Mesh`; the batch is sharded along the `data` axis and params
are replicated, so XLA emits the gradient all-reduce over ICI by itself —
the idiomatic TPU equivalent of the DDP/NCCL machinery the reference class
lacks.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dcf.config import Config
from dcf.models.detector import ContFuseDetector
from dcf.models.head import flatten_predictions
from dcf.train.losses import detection_loss
from dcf.train.state import TrainState, make_optimizer
from dcf.train.targets import assign_targets_batch


def build_loss_fn(cfg: Config, model: ContFuseDetector):
    """Returns loss_fn(params, batch, anchor_pack) -> (loss, metrics).

    The anchor arrays are explicit arguments (device-put once by the
    caller) — never closed-over constants (axon backend perf hazard, see
    dcf.models.anchors.anchor_pack).
    """

    from dcf.models.anchors import anchor_grid_shape
    grid_shape = anchor_grid_shape(cfg)
    grid_origin = (cfg.voxel.x_min, cfg.voxel.y_min)
    grid_cell = cfg.voxel.voxel_size * cfg.backbone.head_stride
    # class-restricted assigner windows need equal per-class rotation
    # counts (static; the anchor axis is class-major)
    rot_counts = {len(a.rotations) for a in cfg.anchors}
    per_class_anchors = (rot_counts.pop() if len(rot_counts) == 1
                         else None)

    def loss_fn(params, batch, pack):
        preds, diag = model.apply(params, batch, mutable="diagnostics")
        flat = flatten_predictions(preds, cfg)
        targets = assign_targets_batch(
            pack["boxes"], pack["classes"], pack["matched_thr"],
            pack["unmatched_thr"],
            batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
            grid_shape=grid_shape, grid_origin=grid_origin,
            grid_cell=grid_cell, window=cfg.train.assigner_window,
            per_class_anchors=per_class_anchors,
            use_pallas_clip=cfg.pallas_clip)
        loss, metrics = detection_loss(flat, targets, cfg.loss)
        metrics.update(_diag_metrics(diag))
        return loss, metrics

    return loss_fn


def _diag_metrics(diag) -> Dict:
    """Sowed per-layer diagnostics -> train metrics (stop-gradient sums).

    Currently: "slab_overflow" = total fusion pairs whose z1 rows fell
    outside the per-slab DMA window across all fusion scales (see
    dcf.models.fusion / fusion_kernel.slab_starts). 0 on KITTI-scale
    data with default caps; the debug step raises on nonzero.
    """
    leaves = jax.tree.leaves(diag)
    if not leaves:
        return {}
    total = sum(jnp.sum(x) for x in leaves)
    return {"slab_overflow": jax.lax.stop_gradient(total)}


def build_loss_sums_fn(cfg: Config, model: ContFuseDetector):
    """Like build_loss_fn but returns UNNORMALIZED loss sums (see
    dcf.train.losses.detection_loss_sums) -- the gradient-accumulation
    building block."""
    from dcf.models.anchors import anchor_grid_shape
    from dcf.train.losses import detection_loss_sums
    grid_shape = anchor_grid_shape(cfg)
    grid_origin = (cfg.voxel.x_min, cfg.voxel.y_min)
    grid_cell = cfg.voxel.voxel_size * cfg.backbone.head_stride
    rot_counts = {len(a.rotations) for a in cfg.anchors}
    per_class_anchors = (rot_counts.pop() if len(rot_counts) == 1
                         else None)

    def sums_fn(params, batch, pack):
        preds, diag = model.apply(params, batch, mutable="diagnostics")
        flat = flatten_predictions(preds, cfg)
        targets = assign_targets_batch(
            pack["boxes"], pack["classes"], pack["matched_thr"],
            pack["unmatched_thr"],
            batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
            grid_shape=grid_shape, grid_origin=grid_origin,
            grid_cell=grid_cell, window=cfg.train.assigner_window,
            per_class_anchors=per_class_anchors,
            use_pallas_clip=cfg.pallas_clip)
        weighted, sums = detection_loss_sums(flat, targets, cfg.loss)
        sums.update(_diag_metrics(diag))
        return weighted, sums

    return sums_fn


def make_train_step(cfg: Config, model: ContFuseDetector
                    ) -> Callable[[TrainState, Dict, Dict],
                                  Tuple[TrainState, Dict]]:
    """Returns train_step(state, batch, anchor_pack) -> (state, metrics);
    jit it with the desired shardings (dcf.parallel.mesh.jit_train_step).

    cfg.train.accum_steps > 1 enables gradient accumulation: the batch is
    split into accum_steps micro-batches processed by a lax.scan, which
    bounds activation memory to one micro-batch. The math is exact
    full-batch semantics (not per-micro averaging): num_pos does not
    depend on the params, so gradients of the unnormalized loss sums
    accumulate and one division by the global num_pos lands the
    full-batch gradient (bf16 forward numerics differ at the micro-batch
    shape, so results match the unaccumulated step to bf16 tolerance).
    """
    loss_fn = build_loss_fn(cfg, model)
    tx = make_optimizer(cfg)
    accum = cfg.train.accum_steps
    ema_decay = cfg.train.ema_decay

    def ema_update(ema, params):
        """EMA of params inside the jitted step (None passes through:
        the pytree structure is static, so the branch is trace-time)."""
        if ema is None or ema_decay <= 0:
            return ema
        d = jnp.float32(ema_decay)
        return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1 - d),
                            ema, params)

    def train_step(state: TrainState, batch: Dict,
                   pack: Dict) -> Tuple[TrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, pack)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax_global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=state.rng,
                               ema_params=ema_update(state.ema_params,
                                                     params))
        return new_state, metrics

    if accum == 1:
        return train_step

    from dcf.train.losses import metrics_from_sums
    sums_fn = build_loss_sums_fn(cfg, model)

    def train_step_accum(state: TrainState, batch: Dict,
                         pack: Dict) -> Tuple[TrainState, Dict]:
        B = next(iter(batch.values())).shape[0]
        assert B % accum == 0, (B, accum)
        micro = {k: v.reshape((accum, B // accum) + v.shape[1:])
                 for k, v in batch.items()}

        def body(carry, mb):
            g_acc, w_acc, s_acc = carry
            (w, sums), g = jax.value_and_grad(
                sums_fn, has_aux=True)(state.params, mb, pack)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            s_acc = jax.tree.map(jnp.add, s_acc, sums)
            return (g_acc, w_acc + w, s_acc), None

        zeros_g = jax.tree.map(jnp.zeros_like, state.params)
        zeros_s = {"cls_sum": 0.0, "reg_sum": 0.0, "num_pos": 0.0}
        if cfg.head.use_direction_classifier:
            zeros_s["dir_sum"] = 0.0
        if cfg.with_fusion and cfg.fusion.use_pallas:
            zeros_s["slab_overflow"] = 0.0
        zeros_s = {k: jnp.zeros((), jnp.float32) for k in zeros_s}
        (grads, weighted, sums), _ = jax.lax.scan(
            body, (zeros_g, jnp.zeros((), jnp.float32), zeros_s), micro)

        num_pos = jnp.maximum(sums["num_pos"], 1.0)
        grads = jax.tree.map(lambda g: g / num_pos, grads)
        _, metrics = metrics_from_sums(weighted, sums)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax_global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=state.rng,
                               ema_params=ema_update(state.ema_params,
                                                     params))
        return new_state, metrics

    return train_step_accum


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))
