"""Orbax checkpointing with real resume.

The reference pickles the entire nn.Module per epoch and its --resume flag
raises NotImplementedError (voxelnet/train.py:22-27, 127-128). Here:
params / batch_stats / optimizer state / step are saved per epoch through
Orbax, a `best` checkpoint is tracked by average validation loss, and
`restore` reconstructs the exact TrainState for seamless resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from voxelnet_tpu.training.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 1000):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                best_fn=lambda metrics: metrics.get("val_loss", float("inf")),
                best_mode="min",
            ),
        )

    def save(self, step: int, state: TrainState,
             metrics: dict[str, float] | None = None) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def best_metric(self, key: str = "val_loss") -> float | None:
        """Best (minimum) recorded value of `key` across saved steps —
        lets a resumed trainer keep its best-val-loss history instead of
        resetting to inf (is_best would otherwise lie after resume)."""
        best = self._mgr.best_step()
        if best is None:
            return None
        metrics = self._mgr.metadata(best).metrics or {}
        v = metrics.get(key)
        return None if v is None else float(v)

    def restore(self, abstract_state: TrainState,
                step: int | None = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def close(self) -> None:
        self._mgr.close()


def save_single(path: str, state: Any) -> None:
    """One-off StandardCheckpointer save (predict-CLI convenience)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)
    ckpt.wait_until_finished()


def restore_single(path: str, abstract_state: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    return ckpt.restore(os.path.abspath(path), target)


def load_variables(path: str) -> dict:
    """Load model variables {'params', 'batch_stats'} from ANY checkpoint
    layout this framework writes:

      * a `save_single` variables checkpoint (bare dict),
      * a CheckpointManager step dir (`.../checkpoints/<step>` with the
        TrainState under `default/`),
      * a CheckpointManager root (`.../checkpoints` — picks the latest step).

    Restores without a target tree (raw pytree) so the caller does not need
    to reconstruct the optimizer state structure.
    """
    p = os.path.abspath(path)
    if os.path.isdir(os.path.join(p, "default")):
        p = os.path.join(p, "default")
    elif not os.path.exists(os.path.join(p, "_METADATA")):
        steps = sorted(int(d) for d in os.listdir(p) if d.isdigit())
        if not steps:
            raise FileNotFoundError(f"no checkpoint found under {path}")
        p = os.path.join(p, str(steps[-1]), "default")

    ckptr = ocp.StandardCheckpointer()
    # build a sharding-free target from the checkpoint's own metadata, so
    # checkpoints written under a device mesh restore on any topology
    meta = ckptr.metadata(p).item_metadata
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    target = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        meta)
    raw = ckptr.restore(p, target)
    if "params" in raw and "batch_stats" in raw:
        return {"params": raw["params"], "batch_stats": raw["batch_stats"]}
    return raw
