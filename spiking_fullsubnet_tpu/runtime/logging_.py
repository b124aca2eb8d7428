"""Logging channels (reference audiozen/logger.py): python logging + TensorBoard."""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path


class TensorboardLogger:
    """SummaryWriter wrapper (logger.py:10-19). Degrades to a JSONL scalar log
    when tensorboard is unavailable, so training never hard-depends on it."""

    def __init__(self, log_dir: str):
        self._jsonl = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir=log_dir, max_queue=5, flush_secs=30)
        except Exception:
            self.writer = None
            Path(log_dir).mkdir(parents=True, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), int(step))
        else:
            import json

            self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
            self._jsonl.flush()

    def add_text(self, tag, text, step=0):
        if self.writer is not None:
            self.writer.add_text(tag, text, int(step))

    def log_config(self, config):
        import json

        self.add_text("config", f"```\n{json.dumps(config, indent=2, default=str)}\n```")

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self._jsonl is not None:
            self._jsonl.close()


def init_logging_logger(config, log_dir_key: str = "save_dir"):
    """Root logger with console + per-run file handler (logger.py:22-81)."""
    exp_id = config["meta"].get("exp_id", "exp")
    save_dir = Path(config["meta"]["save_dir"]).expanduser() / exp_id
    save_dir.mkdir(parents=True, exist_ok=True)
    time_now = time.strftime("%Y_%m_%d--%H_%M_%S")
    log_path = save_dir / f"{exp_id}_{time_now}.log"

    level = os.environ.get("LOG_LEVEL", "INFO").upper()
    root = logging.getLogger()
    root.setLevel(level)
    # third-party chatter (orbax/absl emit one INFO line per checkpoint shard)
    for noisy in ("absl", "orbax", "jax._src"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    try:
        from absl import logging as absl_logging

        absl_logging.set_verbosity(absl_logging.WARNING)
    except ImportError:
        pass
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(name)s - %(message)s")
    # replace ALL existing root handlers (absl/basicConfig install their own,
    # which would double every line)
    root.handlers = []
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    ch._sfs_tpu = True
    fh = logging.FileHandler(log_path)
    fh.setFormatter(fmt)
    fh._sfs_tpu = True
    root.addHandler(ch)
    root.addHandler(fh)
    return root
