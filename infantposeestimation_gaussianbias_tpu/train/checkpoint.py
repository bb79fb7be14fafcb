"""Orbax checkpointing with the reference's latest/best/periodic policy.

The reference saves {epoch, model/optimizer/scheduler state, metrics} as
latest.pth always, best.pth on AP improvement, epoch_N.pth every 10 epochs
(/root/reference/train.py:339-368,461-470) and resumes all of it
(:426-435).  Here the checkpointed pytree is {params, batch_stats,
opt_state, step} + metadata, written asynchronously so training never
blocks on I/O (preemption-safe auto-resume, SURVEY.md section 5.3).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """latest / best / every-N checkpoints of a TrainState."""

    def __init__(self, directory: str, save_every: int = 10):
        self.directory = os.path.abspath(directory)
        self.save_every = save_every
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer() if _HAS_ORBAX else None

    def _tree(self, state) -> Dict[str, Any]:
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _save(self, name: str, state, metadata: Dict[str, Any]) -> None:
        """Checkpoint tree has the exact TrainState structure; metadata
        (whose keys vary per epoch) goes in a sidecar JSON so restore can
        use a fully-typed template — restoring without one would collapse
        the optax NamedTuple state into plain dicts."""
        import json

        tree = self._tree(state)
        path = self._path(name)
        if self._ckpt is not None:
            self._ckpt.save(path, tree, force=True)
            self._ckpt.wait_until_finished()
        else:  # numpy fallback
            flat, _ = jax.tree_util.tree_flatten(tree)
            np.savez(path + ".npz", *[np.asarray(x) for x in flat])
        with open(path + ".meta.json", "w") as f:
            json.dump({k: float(v) for k, v in metadata.items()}, f)

    def save(self, state, epoch: int, metrics: Dict[str, float],
             best_metric: float, monitor: str = "AP",
             latest_interval: int = 1) -> Tuple[float, bool]:
        """Apply the latest/best/periodic policy; returns (best, is_best)."""
        current = float(metrics.get(monitor, -np.inf))
        is_best = current > best_metric
        if is_best:
            best_metric = current
        # persist the running best so resume keeps protecting best.pth
        # (clamped: -inf is not valid JSON)
        meta = {"epoch": epoch, "best": float(max(best_metric, -1e30)),
                **{k: float(v) for k, v in metrics.items()}}
        if latest_interval and (epoch + 1) % latest_interval == 0:
            self._save("latest", state, meta)
        if is_best:
            self._save("best", state, meta)
        if self.save_every and (epoch + 1) % self.save_every == 0:
            self._save(f"epoch_{epoch + 1}", state, meta)
        return best_metric, is_best

    def save_interrupt(self, state, last_completed_epoch: int,
                       best_metric: float) -> None:
        """Preemption save (SIGTERM): write 'latest' stamped with the last
        COMPLETED epoch, so resume replays the interrupted epoch from its
        start — the loader is deterministic in (seed, epoch, index), making
        the replay exact; the step counter simply carries the extra
        mid-epoch steps already taken."""
        self._save("latest", state,
                   {"epoch": last_completed_epoch,
                    "best": float(max(best_metric, -1e30)),
                    "preempted": 1.0})

    def restore(self, state, name: str = "latest"):
        """Restore into the given (abstract or concrete) state; returns
        (state, metadata) or (state, None) when absent."""
        import json

        path = self._path(name)
        if self._ckpt is None or not os.path.exists(path):
            return state, None
        template = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, self._tree(state))
        restored = self._ckpt.restore(path, template)
        meta = None
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"])
        return new_state, meta
