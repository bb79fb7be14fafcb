"""Fused training / evaluation steps.

One jit compiles: on-device Gaussian target generation -> forward (bf16)
-> all loss terms (f32) -> backward -> optimizer update.  The reference
splits this across DataLoader workers, an autocast forward, and a Python
loss assembly (/root/reference/train.py:155-187); here it is a single XLA
program per step with per-term scalars returned for logging (the contract
from SURVEY.md section 5.5).

Batch contract (device arrays):
  image:     (B, H, W, 3) float32, normalized crops
  keypoints: (B, K, 2) in input-image pixels
  visible:   (B, K) raw COCO visibility (0/1/2)
Optionally precomputed 'target' (B, h, w, K) + 'target_weight' (B, K)
override on-device generation (used by parity tests).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses as L
from ..ops import heatmap as heatmap_ops
from .state import TrainState


def _targets(batch, heatmap_size, input_size, sigma):
    if "target" in batch:
        return batch["target"], batch["target_weight"]
    return heatmap_ops.generate_targets(
        batch["keypoints"], batch["visible"], heatmap_size, input_size,
        sigma, "msra")


def make_loss_fn(cfg, schema) -> Callable:
    """Pure loss: (outputs, batch, target, weight) -> (loss, aux dict)."""
    head = cfg.model.head_type
    m = cfg.model
    input_size = tuple(cfg.data.input_size)
    skeleton = jnp.asarray(schema.skeleton_array())
    fusion_weights = (m.heatmap_loss_weight, m.offset_loss_weight,
                      m.peak_loss_weight, m.variance_loss_weight,
                      m.overlap_loss_weight, m.shape_loss_weight)

    def loss_fn(outputs, batch, target, weight):
        if head == "fusion":
            terms = L.fusion_pose_loss(
                outputs, target, weight, batch["keypoints"], skeleton,
                input_size=input_size, weights=fusion_weights,
                target_sigma=cfg.data.sigma,
                use_target_weight=m.use_target_weight)
            return terms["total_loss"], terms
        if head == "heatmap":
            loss = L.keypoint_mse_loss(outputs["heatmaps"], target, weight,
                                       m.use_target_weight)
            return loss, {"total_loss": loss, "heatmap_loss": loss}
        if head == "fused":
            norm = jnp.asarray(input_size, jnp.float32)
            tgts = {"heatmaps": target, "weights": weight,
                    "coords": batch["keypoints"] / norm}
            total, terms = L.combined_loss(
                predictions=outputs, targets=tgts,
                morph_weight=m.morph_weight, morph_lambda=m.morph_lambda,
                morph_mean_lambda=m.morph_mean_lambda,
                reg_weight=m.reg_weight)
            terms = {(k if k != "total" else "total_loss"): v
                     for k, v in terms.items()}
            return total, terms
        if head == "simcc":
            loss = simcc_loss(outputs, batch["keypoints"], weight,
                              input_size, m.simcc_split_ratio,
                              sigma=cfg.data.sigma * m.simcc_split_ratio)
            return loss, {"total_loss": loss, "simcc_loss": loss}
        raise ValueError(f"Unknown head type {head!r}")

    return loss_fn


def simcc_loss(outputs, keypoints, weight, input_size, split_ratio,
               sigma: float = 4.0) -> jnp.ndarray:
    """KL divergence vs Gaussian-smoothed 1-D classification targets — the
    standard SimCC objective for the optional SimCC head
    (/root/reference/analysis/hrnet_improvements.py:145-224)."""

    def axis_loss(logits, coord, n_bins):
        bins = jnp.arange(n_bins, dtype=jnp.float32)
        mu = coord[..., None] * split_ratio  # (B,K,1)
        tgt = jnp.exp(-((bins - mu) ** 2) / (2 * sigma**2))
        tgt = tgt / (jnp.sum(tgt, -1, keepdims=True) + 1e-8)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.sum(tgt * logp, axis=-1)  # (B,K)

    lx = axis_loss(outputs["simcc_x"], keypoints[..., 0],
                   outputs["simcc_x"].shape[-1])
    ly = axis_loss(outputs["simcc_y"], keypoints[..., 1],
                   outputs["simcc_y"].shape[-1])
    per = lx + ly
    return jnp.sum(per * weight) / (jnp.sum(weight) + 1e-8)


def make_train_step(cfg, schema) -> Callable:
    """Build the fused train step: (state, batch, rng) -> (state, metrics)."""
    from ..ops.photometric import color_jitter_normalized

    heatmap_size = tuple(cfg.data.heatmap_size)
    input_size = tuple(cfg.data.input_size)
    sigma = cfg.data.sigma
    jitter = tuple(getattr(cfg.data, "color_jitter", (0.0, 0.0, 0.0)))
    mean, std = cfg.data.pixel_mean, cfg.data.pixel_std
    loss_fn = make_loss_fn(cfg, schema)

    accum = max(1, int(getattr(cfg.train, "grad_accum_steps", 1)))

    def micro_grads(apply_fn, params, stats, batch, rng):
        """Targets -> jitter -> fwd -> loss -> bwd for one (micro)batch."""
        target, weight = _targets(batch, heatmap_size, input_size, sigma)
        rng, jitter_rng = jax.random.split(rng)
        images = color_jitter_normalized(jitter_rng, batch["image"],
                                         mean, std, *jitter)

        def compute(params):
            variables = {"params": params}
            mutable = []
            if stats is not None:
                variables["batch_stats"] = stats
                mutable = ["batch_stats"]
            outputs, mutated = apply_fn(
                variables, images, True, mutable=mutable,
                rngs={"dropout": rng})
            loss, terms = loss_fn(outputs, batch, target, weight)
            return loss, (terms, mutated.get("batch_stats"))

        (_, (terms, new_stats)), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        return grads, terms, new_stats

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if accum == 1:
            grads, terms, new_stats = micro_grads(
                state.apply_fn, state.params, state.batch_stats, batch, rng)
        else:
            b = batch["image"].shape[0]
            if b % accum != 0:
                # Under data parallelism the stronger constraint is
                # (b // accum) % n_data_devices == 0 so each microbatch
                # still shards evenly over the 'data' mesh axis
                # (tests/test_train.py::
                #  test_grad_accum_under_data_parallel_sharding).
                raise ValueError(
                    f"global batch {b} not divisible by "
                    f"grad_accum_steps={accum}")
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum, x.shape[0] // accum)
                                    + x.shape[1:]), batch)
            rngs = jax.random.split(rng, accum)
            first = jax.tree_util.tree_map(lambda x: x[0], micro)
            g_shape, t_shape, _ = jax.eval_shape(
                lambda mb, r: micro_grads(state.apply_fn, state.params,
                                          state.batch_stats, mb, r),
                first, rngs[0])
            # Accumulate in f32 regardless of gradient dtype: under a
            # bf16-params policy the per-microbatch sums would otherwise
            # lose precision vs one large batch (accumulator dtype must
            # not depend on param dtype).
            zeros_f32 = lambda tree: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.float32), tree)

            def body(carry, xs):
                stats, gsum, tsum = carry
                mb, r = xs
                grads, terms, new_stats = micro_grads(
                    state.apply_fn, state.params, stats, mb, r)
                gsum = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(jnp.float32), gsum, grads)
                tsum = jax.tree_util.tree_map(
                    lambda a, t: a + t.astype(jnp.float32), tsum, terms)
                stats = new_stats if stats is not None else None
                return (stats, gsum, tsum), None

            (new_stats, gsum, tsum), _ = jax.lax.scan(
                body, (state.batch_stats, zeros_f32(g_shape),
                       zeros_f32(t_shape)),
                (micro, rngs))
            inv = 1.0 / accum
            grads = jax.tree_util.tree_map(
                lambda g, s: (g * inv).astype(s.dtype), gsum, g_shape)
            terms = jax.tree_util.tree_map(
                lambda t, s: (t * inv).astype(s.dtype), tsum, t_shape)

        new_state = state.apply_gradients(grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        metrics = dict(terms)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def make_eval_step(cfg, schema) -> Callable:
    """Eval forward + loss (no update): (state, batch) -> metrics."""
    heatmap_size = tuple(cfg.data.heatmap_size)
    input_size = tuple(cfg.data.input_size)
    sigma = cfg.data.sigma
    loss_fn = make_loss_fn(cfg, schema)

    def eval_step(state: TrainState, batch):
        target, weight = _targets(batch, heatmap_size, input_size, sigma)
        outputs = state.apply_fn(state.variables, batch["image"], False)
        loss, terms = loss_fn(outputs, batch, target, weight)
        return outputs, terms

    return eval_step


def create_train_state(cfg, model, rng, mesh=None) -> TrainState:
    """Initialize params (+ batch stats) and optimizer state.

    With a mesh, parameters are placed replicated (or model-sharded under
    cfg.parallel.tensor_parallel) so the jit'd step compiles with the right
    shardings.
    """
    from ..parallel import shard_params
    from .optim import build_optimizer

    W, H = cfg.data.input_size
    dummy = jnp.zeros((2, H, W, 3), jnp.float32)
    variables = model.init(rng, dummy, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")

    steps = cfg.train.steps_per_epoch or 1000
    tx, _ = build_optimizer(cfg, steps)
    state = TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=batch_stats, tx=tx)
    if mesh is not None:
        state = shard_params(state, mesh,
                             cfg.parallel.tensor_parallel)
    return state
