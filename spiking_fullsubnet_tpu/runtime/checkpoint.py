"""Checkpointing: best/latest/rotating epoch dirs (reference trainer.py:193-260).

Layout matches the reference exactly:
    <exp_dir>/checkpoints/epoch_0042/   (rotating, keep max_num_checkpoints)
    <exp_dir>/checkpoints/best/         (overwritten on score improvement)

Arrays are stored with Orbax. Saves are ASYNC (SURVEY §5d): save() returns
as soon as the host copy is snapshotted and the write proceeds in the
background, so the training step loop is not blocked by checkpoint IO; the
previous write is awaited before the next save touches the directory tree,
and load()/wait() force completion.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .trainer_state import TrainerState


def _replicated_mesh():
    return jax.sharding.Mesh(np.array(jax.devices()), ("d",))


def _globalize(tree):
    """Host-local replicated arrays -> global arrays for multihost Orbax.

    With process_count > 1, per-process SingleDeviceSharding arrays cannot
    be serialized (Orbax requires global arrays); the trainer keeps params
    replicated across processes, so the fully-replicated conversion is
    exact.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def conv(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return multihost_utils.host_local_array_to_global_array(
                x, _replicated_mesh(), jax.sharding.PartitionSpec())
        return x

    return jax.tree.map(conv, tree)


def _localize(tree):
    """Global replicated arrays -> host-local after a multihost restore."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return multihost_utils.global_array_to_host_local_array(
                x, _replicated_mesh(), jax.sharding.PartitionSpec())
        return x

    return jax.tree.map(conv, tree)


class CheckpointManager:
    def __init__(self, checkpoints_dir, max_num_checkpoints: int = 10):
        self.dir = Path(checkpoints_dir).expanduser().absolute()
        self.max_num_checkpoints = max_num_checkpoints
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------- paths

    def find_latest(self) -> Path:
        """Latest rotating checkpoint (trainer.py:193-207)."""
        cands = sorted(p for p in self.dir.glob("epoch_" + "[0-9]" * 4) if p.is_dir())
        if not cands:
            raise FileNotFoundError(f"No checkpoints found in {self.dir}")
        return cands[-1]

    def resolve(self, ckpt_path: str) -> Path:
        if ckpt_path == "best":
            path = self.dir / "best"
        elif ckpt_path == "latest":
            path = self.find_latest()
        else:
            path = Path(ckpt_path).expanduser().absolute()
        if not path.exists():
            raise FileNotFoundError(f"Checkpoint {path} not found.")
        return path

    # ------------------------------------------------------------- save/load

    def save(
        self,
        epoch: int,
        train_pytree: Dict[str, Any],
        trainer_state: TrainerState,
        is_best_epoch: bool = False,
    ) -> Path:
        """Async save + rotate (trainer.py:229-260).

        Returns once the write is scheduled; the previous pending write (if
        any) is awaited first so directory surgery below never races it.
        Rotation only deletes *older* completed epoch dirs — the in-flight
        write is always the newest and is never a deletion candidate.
        """
        from ..parallel.dist import wait_for_everyone

        self._ckptr.wait_until_finished()
        if is_best_epoch:
            path = self.dir / "best"
        else:
            path = self.dir / f"epoch_{str(epoch).zfill(4)}"
        # directory surgery is rank-0-only (the exp dir is a shared
        # filesystem on a pod; concurrent rmtree of the same 'best' dir
        # races to FileNotFoundError) — but the Orbax save itself is a
        # COLLECTIVE every process must enter, so barrier in between.
        if jax.process_index() == 0:
            if path.exists():
                shutil.rmtree(path)
            path.parent.mkdir(parents=True, exist_ok=True)
        wait_for_everyone("ckpt-dir-clean")
        self._ckptr.save(path / "arrays", _globalize(train_pytree))
        if jax.process_index() == 0:
            trainer_state.save_json(path / "trainer_state.json")

            # rotation: keep newest max_num_checkpoints epoch_* dirs
            checkpoints = sorted(self.dir.glob("epoch_*"))
            if len(checkpoints) > self.max_num_checkpoints:
                for old in checkpoints[: -self.max_num_checkpoints]:
                    shutil.rmtree(old)
        return path

    def wait(self):
        """Block until any in-flight async save has committed to disk."""
        self._ckptr.wait_until_finished()

    def load(
        self,
        ckpt_path: str,
        target_pytree: Dict[str, Any],
        trainer_state: Optional[TrainerState] = None,
    ) -> Dict[str, Any]:
        """Restore arrays (structure taken from target_pytree) + counters."""
        self._ckptr.wait_until_finished()
        path = self.resolve(ckpt_path)
        if jax.process_count() > 1:
            sharding = jax.sharding.NamedSharding(
                _replicated_mesh(), jax.sharding.PartitionSpec())
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
                target_pytree)
        else:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target_pytree)
        restored = _localize(self._ckptr.restore(path / "arrays", abstract))
        if trainer_state is not None and (path / "trainer_state.json").exists():
            trainer_state.load_json(path / "trainer_state.json")
        return restored

    def load_weights(self, ckpt_path: str) -> Dict[str, Any]:
        """Structure-free restore of the full saved tree (numpy leaves).

        Used by finetune to warm-start weights without needing the saved
        optimizer state's structure to match the new run's optimizer —
        'load model weights only' stays independent of the saved opt_state.
        """
        self._ckptr.wait_until_finished()
        path = self.resolve(ckpt_path)
        return self._ckptr.restore(path / "arrays")

    def load_trainer_state(self, ckpt_path: str, trainer_state: TrainerState):
        path = self.resolve(ckpt_path)
        if (path / "trainer_state.json").exists():
            trainer_state.load_json(path / "trainer_state.json")
