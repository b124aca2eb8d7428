"""Checkpointing: best/latest/rotating epoch dirs (reference trainer.py:193-260).

Layout matches the reference exactly:
    <exp_dir>/checkpoints/epoch_0042/   (rotating, keep max_num_checkpoints)
    <exp_dir>/checkpoints/best/         (overwritten on score improvement)

Arrays are stored with Orbax (TPU-native async-capable, sharding-aware
restore on pods); TrainerState counters as JSON alongside.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from .trainer_state import TrainerState


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
        """Save + rotate (trainer.py:229-260)."""
        if is_best_epoch:
            path = self.dir / "best"
        else:
            path = self.dir / f"epoch_{str(epoch).zfill(4)}"
        if path.exists():
            shutil.rmtree(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        self._ckptr.save(path / "arrays", train_pytree)
        self._ckptr.wait_until_finished()
        trainer_state.save_json(path / "trainer_state.json")

        # rotation: keep newest max_num_checkpoints epoch_* dirs
        checkpoints = sorted(self.dir.glob("epoch_*"))
        if len(checkpoints) > self.max_num_checkpoints:
            for old in checkpoints[: -self.max_num_checkpoints]:
                shutil.rmtree(old)
        return path

    def load(
        self,
        ckpt_path: str,
        target_pytree: Dict[str, Any],
        trainer_state: Optional[TrainerState] = None,
    ) -> Dict[str, Any]:
        """Restore arrays (structure taken from target_pytree) + counters."""
        path = self.resolve(ckpt_path)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target_pytree)
        restored = self._ckptr.restore(path / "arrays", abstract)
        if trainer_state is not None and (path / "trainer_state.json").exists():
            trainer_state.load_json(path / "trainer_state.json")
        return restored
