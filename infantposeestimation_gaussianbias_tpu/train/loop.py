"""Full training / validation loops (driver layer).

Rebuild of /root/reference/train.py:131-325 and /root/reference/validate.py:
epoch loop with per-term loss logging, periodic flip-test validation with
COCO AP, latest/best/periodic checkpointing — on the fused jit'd step,
a device mesh, and the threaded host loader.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.pipeline import DataLoader, device_batch
from ..eval import COCOEvaluator, MetricLogger
from ..models import build_model, flip_inference
from ..ops import decode as decode_ops
from ..parallel import (
    allgather_host_values,
    create_mesh,
    host_local_rows,
    shard_batch,
)
from .checkpoint import CheckpointManager
from .logging import MetricsWriter
from .optim import build_optimizer
from .step import create_train_state, make_train_step

log = logging.getLogger("ipe_tpu.train")

# Preemption flag: set by SIGTERM (what spot/preemptible TPU VMs receive
# shortly before eviction) while training runs, checked once per step.
# Module-level so tests can trigger a deterministic "preemption" without
# racing a real signal.  The reference has no equivalent — it loses all
# progress since the last epoch-end save (/root/reference/train.py:461-470).
import threading

_PREEMPTED = threading.Event()


class _PreemptionGuard:
    """Install a SIGTERM handler that sets ``_PREEMPTED`` (main thread
    only — signal handlers cannot be installed elsewhere); restore the
    previous handler on exit.  On multi-host TPU pods the platform sends
    the eviction signal to every worker, so each process reaches the
    collective checkpoint save together."""

    def __enter__(self):
        import signal

        self._prev = None
        if threading.current_thread() is threading.main_thread():
            self._prev = signal.signal(
                signal.SIGTERM,
                lambda signum, frame: _PREEMPTED.set())
        return self

    def __exit__(self, *exc):
        import signal

        if self._prev is not None:
            signal.signal(signal.SIGTERM, self._prev)
        return False


def setup_logging(log_file: Optional[str] = None) -> None:
    handlers = [logging.StreamHandler()]
    if log_file:
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s",
                        handlers=handlers, force=True)


def validate(cfg: Config, state, loader: DataLoader,
             gt_dataset: Dict, mesh=None,
             with_loss: bool = True,
             apply_fn=None, variables=None) -> Dict[str, float]:
    """Flip-test validation -> COCO AP + val loss (ref validate.py:39-140;
    the reference runs an extra loss-only forward per batch — here the loss
    shares the unflipped forward inside one jit).

    ``apply_fn``/``variables`` override the serving model (int8 PTQ or
    BN-folded variants); the optional loss still runs on the float state.
    """
    from .step import make_eval_step

    schema = cfg.data.keypoint_schema
    flip_idx = jnp.asarray(schema.flip_index())
    evaluator = COCOEvaluator(schema.oks_sigma_array(), gt_dataset)
    mean, std = cfg.data.pixel_mean, cfg.data.pixel_std
    W, H = cfg.data.input_size
    hm_w, hm_h = cfg.data.heatmap_size
    eval_step = jax.jit(make_eval_step(cfg, schema)) if with_loss else None
    loss_meter = MetricLogger()

    serve_apply = apply_fn if apply_fn is not None else state.apply_fn

    @jax.jit
    def infer_batch(variables, images, centers, scales):
        coords, scores = flip_inference(
            serve_apply, variables, images, flip_idx,
            cfg.model.head_type, cfg.eval.decode,
            shift_heatmap=cfg.eval.shift_heatmap, flip=cfg.eval.flip_test)
        coords = coords * jnp.asarray([W / hm_w, H / hm_h], jnp.float32)
        coords = decode_ops.transform_preds(coords, centers, scales, (W, H))
        return coords, scores

    if variables is None:
        variables = state.variables
    n = 0
    t0 = time.time()
    for batch in loader.epoch(0):
        db = device_batch(batch, mean, std)
        if mesh is not None:
            db = shard_batch(db, mesh)
        coords, scores = infer_batch(variables, db["image"],
                                     db["center"], db["scale"])
        # Multi-host: every process holds only its rows of the sharded
        # outputs; gather each batch so all hosts accumulate the full
        # prediction set (and compute identical AP).  Identity on 1 host.
        pack = allgather_host_values({
            "coords": host_local_rows(coords),
            "scores": host_local_rows(scores),
            "ids": np.asarray(batch["image_id"]),
            "valid": np.asarray(batch["valid"]),
        })
        evaluator.update(pack["ids"], pack["coords"], pack["scores"],
                         valid=pack["valid"] > 0)
        if eval_step is not None:
            _, terms = eval_step(state, db)
            loss_meter.update(n=int(pack["valid"].sum()),
                              val_loss=float(terms["total_loss"]))
        n += int(pack["valid"].sum())
    results = evaluator.evaluate()
    if eval_step is not None:
        results.update(loss_meter.summary())
    log.info("validated %d samples in %.1fs: AP=%.4f AP50=%.4f AP75=%.4f "
             "AR=%.4f", n, time.time() - t0, results["AP"],
             results["AP50"], results["AP75"], results["AR"])
    return results


def train(cfg: Config, train_loader: DataLoader,
          val_loader: Optional[DataLoader] = None,
          gt_dataset: Optional[Dict] = None,
          max_epochs: Optional[int] = None,
          use_mesh: bool = True,
          profile_steps: Optional[tuple] = None):
    """Main training driver (ref train.py:371-473). Returns final state.

    ``profile_steps=(start, stop)`` captures a jax.profiler (XProf) trace
    of global steps [start, stop) into ``<log_dir>/profile`` — the
    in-framework equivalent of the reference's manual timing hooks
    (SURVEY.md section 5.1); view with TensorBoard or xprof.
    """
    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)

    mesh = None
    if use_mesh:
        import math

        n_dev = len(jax.devices())
        model_ax = max(1, cfg.parallel.model_axis)
        data_ax = cfg.parallel.data_axis
        if data_ax <= 0:
            data_ax = n_dev // model_ax
        # the batch must divide the data axis; shrink to the gcd if not
        usable = math.gcd(cfg.train.global_batch_size, data_ax)
        if usable != data_ax:
            log.warning("batch %d not divisible by data axis %d; using a "
                        "%d-device data axis", cfg.train.global_batch_size,
                        data_ax, usable)
        devices = jax.devices()[: usable * model_ax]
        mesh = create_mesh(usable, model_ax, devices=devices)
    steps_per_epoch = len(train_loader)
    cfg.train.steps_per_epoch = steps_per_epoch

    # The mesh reaches build_model so the Pallas W-MSA kernel composes
    # with it via shard_map (hrformer) instead of replicating operands.
    multi = mesh is not None and mesh.devices.size > 1
    model = build_model(cfg, mesh=mesh if multi else None)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = create_train_state(cfg, model, rng, mesh=mesh)
    step_fn = jax.jit(make_train_step(cfg, cfg.data.keypoint_schema),
                      donate_argnums=0)

    ckpt = CheckpointManager(cfg.train.checkpoint_dir, cfg.train.save_every)
    state, meta = ckpt.restore(state)
    start_epoch = int(meta["epoch"]) + 1 if meta is not None else 0
    best = float(meta.get("best", -np.inf)) if meta is not None else -np.inf
    if start_epoch:
        log.info("resumed from epoch %d", start_epoch)

    mean, std = cfg.data.pixel_mean, cfg.data.pixel_std
    epochs = max_epochs if max_epochs is not None else cfg.train.max_epochs
    dropout_rng = jax.random.PRNGKey(cfg.train.seed + 1)
    _, lr_schedule = build_optimizer(cfg, steps_per_epoch)
    # metrics files are written by process 0 only; checkpoint saves stay
    # on every process (orbax multi-host saves are collective)
    writer = (MetricsWriter(cfg.log_dir) if jax.process_index() == 0
              else None)

    prof_start, prof_stop = profile_steps or (None, None)
    prof_dir = os.path.join(cfg.log_dir, "profile")
    profiling = False
    steps_done = 0

    with _PreemptionGuard():
        state, profiling = _epoch_loop(
            cfg, state, step_fn, train_loader, val_loader, gt_dataset,
            mesh, ckpt, start_epoch, epochs, best, mean, std, dropout_rng,
            lr_schedule, writer, steps_per_epoch,
            prof_start, prof_stop, prof_dir, profiling, steps_done)
    if profiling:  # window ran past the end of training
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
        log.info("profiler trace (truncated) written to %s", prof_dir)
    return state


def _epoch_loop(cfg, state, step_fn, train_loader, val_loader, gt_dataset,
                mesh, ckpt, start_epoch, epochs, best, mean, std,
                dropout_rng, lr_schedule, writer, steps_per_epoch,
                prof_start, prof_stop, prof_dir, profiling, steps_done):
    for epoch in range(start_epoch, epochs):
        logger = MetricLogger()
        t0 = time.time()
        for i, batch in enumerate(train_loader.epoch(epoch)):
            if prof_start is not None and steps_done == prof_start:
                jax.block_until_ready(state.params)  # drain async dispatch
                jax.profiler.start_trace(prof_dir)
                profiling = True
            db = device_batch(batch, mean, std)
            if mesh is not None:
                db = shard_batch(db, mesh)
            dropout_rng, sub = jax.random.split(dropout_rng)
            state, metrics = step_fn(state, db, sub)
            steps_done += 1
            if _PREEMPTED.is_set():
                if profiling:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                ckpt.save_interrupt(state, epoch - 1, best)
                log.warning(
                    "SIGTERM: saved preemption checkpoint at epoch %d "
                    "step %d (resume replays epoch %d from its start)",
                    epoch, i + 1, epoch)
                return state, profiling
            if profiling and steps_done == prof_stop:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
                log.info("profiler trace for steps [%d, %d) written to %s",
                         prof_start, prof_stop, prof_dir)
            if (i + 1) % cfg.train.log_interval == 0 or i == 0:
                scalars = {k: float(v) for k, v in metrics.items()}
                scalars["lr"] = float(lr_schedule(int(state.step)))
                logger.update(**scalars)
                if writer is not None:
                    writer.write(int(state.step), scalars, prefix="train/")
                log.info("epoch %d [%d/%d] %s", epoch, i + 1,
                         steps_per_epoch,
                         " ".join(f"{k}={v:.4f}"
                                  for k, v in scalars.items()))
        log.info("epoch %d done in %.1fs  %s", epoch, time.time() - t0,
                 logger)

        metrics_out = logger.summary()
        if (val_loader is not None and gt_dataset is not None and
                (epoch + 1) % cfg.train.val_interval == 0):
            results = validate(cfg, state, val_loader, gt_dataset, mesh)
            metrics_out.update(results)
            if writer is not None:
                writer.write(int(state.step), results, prefix="val/")
        best, is_best = ckpt.save(
            state, epoch, metrics_out, best, monitor=cfg.train.save_best,
            latest_interval=cfg.train.save_latest_interval)
        if is_best:
            log.info("new best %s=%.4f at epoch %d", cfg.train.save_best,
                     best, epoch)
    return state, profiling
