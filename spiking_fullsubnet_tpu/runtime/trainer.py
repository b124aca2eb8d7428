"""Trainer runtime: epoch loop, jitted train step, validation, checkpoints.

TPU-native re-design of the reference Trainer (audiozen/trainer.py:29-828).
Behavioral parity (SURVEY.md §3.1/§3.5):
- max_steps/max_epochs control flow, gradient accumulation, grad-norm clip,
  per-update LR schedule, periodic validation, patience-based early stopping
  synchronized across processes, best + rotating checkpoints, exp-dir layout
  `save_dir/exp_id/{checkpoints,tb_log,enhanced,metrics}`, config snapshot,
  TB scalars (per-step norm/lr, per-epoch losses).

Architectural differences (deliberate, TPU-first):
- The recipe's `training_step` is a PURE function
  (params, model_state, batch) -> (loss, loss_dict, new_model_state);
  the base trainer wraps it in value_and_grad + clip + optax update inside
  ONE jitted step, compiled once, with the batch sharded over the mesh's
  'data' axis. XLA inserts the gradient all-reduce over ICI — the NCCL
  equivalent costs nothing in user code.
- Gradient accumulation splits the fused step into a jitted grad-accum step
  and a jitted apply step (grads held on device, scheduler stepped once per
  update, mirroring accelerate's optimizer_step_was_skipped gating).
- BN running statistics (`model_state`) thread through the step explicitly.
"""

from __future__ import annotations

import logging
import math
import sys
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dsp.spectral import istft, stft
from ..parallel.dist import (
    broadcast_from_main,
    gather_for_metrics,
    is_main_process,
    reduce_scalar_sum,
    wait_for_everyone,
)
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from .checkpoint import CheckpointManager
from .config import toml_dump
from .debug import detect_overflow, enable_debug_nans
from .logging_ import TensorboardLogger
from .optimization import create_warmup_schedule, get_warmup_steps
from .trainer_state import TrainerState

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        config: Dict[str, Any],
        resume: bool,
        model: Dict[str, Any],
        optimizer_factory,
        base_lr: float,
        loss_function=None,
        mesh=None,
    ):
        """
        Args:
            config: full experiment TOML dict (needs meta/trainer/acoustics).
            resume: resume from the latest checkpoint.
            model: bundle dict with keys:
                "config": model config object,
                "apply":  pure apply fn,
                "params": parameter pytree,
                "state":  mutable model state pytree (BN running stats),
            optimizer_factory: schedule -> optax.GradientTransformation.
            base_lr: learning rate before schedule shaping.
            loss_function: optional callable passed through to recipes.
        """
        self.config = config
        self.resume = resume
        self._initialize_exp_dirs_and_paths(config)

        self.model = model
        self.params = model["params"]
        self.model_state = model["state"]
        self.model_apply = model["apply"]
        self.model_config = model.get("config")
        self.optimizer_factory = optimizer_factory
        self.base_lr = base_lr
        self.loss_function = loss_function

        self._setup_acoustic_args(config.get("acoustics", {}))

        # Trainer args (reference trainer.py:60-74)
        trainer_config = config["trainer"]["args"]
        self.trainer_config = trainer_config
        self.debug = trainer_config.get("debug", False)
        self.max_steps = trainer_config.get("max_steps", 0)
        self.max_epochs = trainer_config.get("max_epochs", sys.maxsize)
        self.max_grad_norm = trainer_config.get("max_grad_norm", 0)
        self.save_max_score = trainer_config.get("save_max_score", True)
        self.save_ckpt_interval = trainer_config.get("save_ckpt_interval", 1)
        self.max_patience = trainer_config.get("max_patience", 10)
        self.plot_norm = trainer_config.get("plot_norm", True)
        self.plot_lr = trainer_config.get("plot_lr", False)
        self.validation_interval = trainer_config.get("validation_interval", 1)
        self.max_num_checkpoints = trainer_config.get("max_num_checkpoints", 10)
        self.scheduler_name = trainer_config.get("scheduler_name", "constant_schedule_with_warmup")
        self.warmup_steps = trainer_config.get("warmup_steps", 0)
        self.warmup_ratio = trainer_config.get("warmup_ratio", 0.0)
        self.gradient_accumulation_steps = trainer_config.get("gradient_accumulation_steps", 1)

        self.state = TrainerState(save_max_score=self.save_max_score)
        self.ckpt_manager = CheckpointManager(self.checkpoints_dir, self.max_num_checkpoints)

        # Mesh: data-parallel over all local/global devices by default.
        self.mesh = mesh if mesh is not None else (make_mesh() if len(jax.devices()) > 1 else None)

        if is_main_process():
            for d in [self.exp_dir, self.checkpoints_dir, self.tb_log_dir, self.enhanced_dir, self.metrics_dir]:
                Path(d).mkdir(parents=True, exist_ok=True)

        self.writer = TensorboardLogger(str(self.tb_log_dir))
        self.writer.log_config(config)
        try:
            toml_dump(config, self.config_path)
        except TypeError:
            pass  # configs with exotic values skip the snapshot rather than crash

        if self.debug:
            enable_debug_nans(True)

        self.optimizer = None  # constructed in _build_optimizer (needs max_steps)
        self.opt_state = None
        self.lr_schedule = None
        self._jit_cache: Dict[str, Any] = {}
        self._warned_unsharded = False

        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))
        logger.info(f"Model parameters: {n_params:,}")

    # ------------------------------------------------------------------ setup

    def _setup_acoustic_args(self, acoustic_args):
        """stft/istft partials bound to the experiment's acoustics
        (reference trainer.py:141-157)."""
        n_fft = acoustic_args.get("n_fft", 512)
        hop_length = acoustic_args.get("hop_length", 128)
        win_length = acoustic_args.get("win_length", 512)
        self.sr = acoustic_args.get("sr", 16000)
        self.stft = partial(stft, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
        self.istft = partial(istft, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
        self.n_fft, self.hop_length, self.win_length = n_fft, hop_length, win_length

    @staticmethod
    def _get_time_now():
        return time.strftime("%Y_%m_%d--%H_%M_%S")

    def _initialize_exp_dirs_and_paths(self, config):
        """Exp-dir layout (reference trainer.py:163-191)."""
        self.save_dir = Path(config["meta"]["save_dir"]).expanduser().absolute()
        self.exp_dir = self.save_dir / config["meta"]["exp_id"]
        self.checkpoints_dir = self.exp_dir / "checkpoints"
        self.tb_log_dir = self.exp_dir / "tb_log"
        self.enhanced_dir = self.exp_dir / "enhanced"
        self.metrics_dir = self.exp_dir / "metrics"
        self.config_path = self.exp_dir / f"config__{self._get_time_now()}.toml"

    # ------------------------------------------------------------------ optimizer / step

    def _generator_schedule(self, max_steps: int):
        num_warmup = get_warmup_steps(self.warmup_steps, max_steps, self.warmup_ratio)
        return create_warmup_schedule(self.scheduler_name, self.base_lr, max_steps, num_warmup)

    def _build_optimizer(self, max_steps: int):
        self.lr_schedule = self._generator_schedule(max_steps)
        tx = self.optimizer_factory(self.lr_schedule)
        if self.max_grad_norm and self.max_grad_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(float(self.max_grad_norm)), tx)
        self.optimizer = tx
        if self.opt_state is None:
            self.opt_state = tx.init(self.params)

    def _train_pytree(self):
        return {
            "params": self.params,
            "model_state": self.model_state,
            "opt_state": self.opt_state,
        }

    def _place_replicated(self):
        if self.mesh is not None:
            rs = replicated_sharding(self.mesh)

            def put(x):
                # Multi-process placement care: an already-GLOBAL fully-
                # replicated array (Orbax restore) is kept as is, and a
                # COMMITTED process-local device array (checkpoint._localize
                # output) is pulled to host first — device_put would
                # otherwise route both through the cross-host transfer
                # machinery, which CPU/gloo does not support.
                if isinstance(x, jax.Array) and jax.process_count() > 1:
                    if not x.is_fully_addressable:
                        if x.sharding.is_fully_replicated:
                            return x
                    else:
                        return jax.device_put(np.asarray(x), rs)
                return jax.device_put(x, rs)

            self.params = jax.tree.map(put, self.params)
            self.model_state = jax.tree.map(put, self.model_state)
            if self.opt_state is not None:
                self.opt_state = jax.tree.map(put, self.opt_state)

    def _place_batch(self, batch):
        arrays = tuple(x for x in batch if isinstance(x, np.ndarray))
        if self.mesh is not None:
            pc = jax.process_count()
            if pc > 1:
                # multi-host: the loader yields this process's SHARD of the
                # global batch (shard_across_processes); assemble the global
                # mesh-sharded array from the per-process locals. Local rows
                # must split over this process's slice of the data axis.
                local_dev = len(self.mesh.local_devices)
                if all(a.shape[0] % local_dev == 0 for a in arrays):
                    bs = batch_sharding(self.mesh)
                    return tuple(
                        jax.make_array_from_process_local_data(bs, a)
                        for a in arrays
                    )
            else:
                n = self.mesh.size
                if all(a.shape[0] % n == 0 for a in arrays):
                    bs = batch_sharding(self.mesh)
                    return tuple(jax.device_put(a, bs) for a in arrays)
            if not self._warned_unsharded:
                logger.warning(
                    f"Batch dim {arrays[0].shape[0]} not divisible by the local "
                    f"device count of mesh {self.mesh.shape}; running replicated "
                    "(increase batch_size to shard)."
                )
                self._warned_unsharded = True
        return tuple(jnp.asarray(a) for a in arrays)

    def _get_fused_step(self):
        if "fused" in self._jit_cache:
            return self._jit_cache["fused"]

        def step(params, model_state, opt_state, batch):
            def loss_fn(p):
                loss, loss_dict, new_state = self.training_step_fn(p, model_state, batch)
                return loss, (loss_dict, new_state)

            (loss, (loss_dict, new_model_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grad_norm = optax.global_norm(grads)
            updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_model_state, new_opt_state, loss_dict, grad_norm

        fn = jax.jit(step, donate_argnums=(0, 1, 2))
        self._jit_cache["fused"] = fn
        return fn

    def _get_accum_steps(self):
        if "accum" in self._jit_cache:
            return self._jit_cache["accum"]

        def grad_step(params, model_state, grads_acc, batch):
            def loss_fn(p):
                loss, loss_dict, new_state = self.training_step_fn(p, model_state, batch)
                return loss, (loss_dict, new_state)

            (loss, (loss_dict, new_model_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_acc = jax.tree.map(lambda a, g: a + g, grads_acc, grads)
            return new_acc, new_model_state, loss_dict

        def apply_step(params, opt_state, grads_acc):
            grads = jax.tree.map(lambda g: g / self.gradient_accumulation_steps, grads_acc)
            grad_norm = optax.global_norm(grads)
            updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            zeros = jax.tree.map(jnp.zeros_like, grads_acc)
            return new_params, new_opt_state, zeros, grad_norm

        fns = (jax.jit(grad_step, donate_argnums=(2,)), jax.jit(apply_step, donate_argnums=(1, 2)))
        self._jit_cache["accum"] = fns
        return fns

    # ------------------------------------------------------------------ recipe contract

    def training_step_fn(self, params, model_state, batch):
        """PURE training step: (params, model_state, batch_arrays) ->
        (loss, loss_dict, new_model_state). Implement in the recipe."""
        raise NotImplementedError

    def validation_step(self, batch, batch_idx, dataloader_idx=0):
        raise NotImplementedError

    def validation_epoch_end(self, validation_epoch_output):
        raise NotImplementedError

    def test_step(self, batch, batch_idx, dataloader_idx=0):
        raise NotImplementedError

    def test_epoch_end(self, test_epoch_output):
        raise NotImplementedError

    def predict_step(self, batch, batch_idx, dataloader_idx=0):
        pass

    def training_epoch_end(self, training_epoch_output):
        """Mean losses -> TB (reference trainer.py:650-686)."""
        if not training_epoch_output:
            return
        loss_keys = training_epoch_output[0].keys()
        for key in loss_keys:
            loss_mean = float(np.mean([step_out[key] for step_out in training_epoch_output]))
            if is_main_process():
                logger.info(f"Loss '{key}' on epoch {self.state.epochs_trained}: {loss_mean}")
                self.writer.add_scalar(f"Train_Epoch/{key}", loss_mean, self.state.epochs_trained)

    # ------------------------------------------------------------------ checkpointing

    def _save_checkpoint(self, epoch: int, is_best_epoch: bool):
        if is_main_process() or jax.process_count() > 1:
            self.ckpt_manager.save(epoch, self._train_pytree(), self.state, is_best_epoch)

    def _load_checkpoint(self, ckpt_path: str):
        restored = self.ckpt_manager.load(ckpt_path, self._train_pytree(), self.state)
        self.params = restored["params"]
        self.model_state = restored["model_state"]
        if self.opt_state is not None:
            self.opt_state = restored["opt_state"]
        self._place_replicated()
        logger.info(f"Checkpoint on epoch {self.state.epochs_trained} is loaded.")

    def _load_eval_weights(self, ckpt_path: str):
        """Load weights for test/predict; a pre-imported torch checkpoint
        (--torch_ckpt) takes precedence when no framework checkpoint exists.
        ckpt_path='init' explicitly evaluates the freshly initialized
        weights (smoke runs / harness e2e tests)."""
        if ckpt_path == "init":
            logger.warning("ckpt_path='init': evaluating UNTRAINED weights.")
            return
        if getattr(self, "_ckpt_preloaded", False):
            try:
                self.ckpt_manager.resolve(ckpt_path)
            except FileNotFoundError:
                logger.info("Using pre-imported torch checkpoint weights for evaluation.")
                return
        self._load_checkpoint(ckpt_path)

    def _check_improvement(self, score, save_max_score=True):
        return score > self.state.best_score if save_max_score else score < self.state.best_score

    def _run_early_stop_check(self, score: float) -> bool:
        """(reference trainer.py:119-139)"""
        if self._check_improvement(score, self.save_max_score):
            self.state.best_score = score
            self.state.best_score_epoch = self.state.epochs_trained
            self._save_checkpoint(self.state.epochs_trained, is_best_epoch=True)
            self.state.patience = 0
            logger.info(f"Found new best score: {score:.4f}, saving checkpoint...")
            return False
        self.state.patience += 1
        logger.info(
            f"Score did not improve from {self.state.best_score:.4f} at epoch "
            f"{self.state.best_score_epoch}. Early stopping counter: "
            f"{self.state.patience} out of {self.max_patience}"
        )
        return self.state.patience >= self.max_patience

    # ------------------------------------------------------------------ train

    def train(self, train_dataloader, validation_dataloaders):
        """Epoch loop (reference trainer.py:327-468)."""
        early_stop_mark = 0.0

        steps_per_epoch = len(train_dataloader)
        update_steps_per_epoch = max(steps_per_epoch // self.gradient_accumulation_steps, 1)
        if self.max_steps > 0:
            max_steps = self.max_steps
            max_epochs = self.max_steps // update_steps_per_epoch + int(
                self.max_steps % update_steps_per_epoch > 0
            )
        else:
            max_steps = self.max_epochs * update_steps_per_epoch
            max_epochs = self.max_epochs

        logger.info(
            f"Training control variables: steps_per_epoch={steps_per_epoch}, "
            f"grad_accum={self.gradient_accumulation_steps}, "
            f"update_steps_per_epoch={update_steps_per_epoch}, "
            f"max_steps={max_steps}, max_epochs={max_epochs}"
        )

        self._build_optimizer(max_steps)
        if self.resume:
            self._load_checkpoint("latest")
        self._place_replicated()

        accum = self.gradient_accumulation_steps
        if accum > 1:
            grad_step, apply_step = self._get_accum_steps()
            grads_acc = jax.tree.map(jnp.zeros_like, self.params)
        else:
            fused_step = self._get_fused_step()

        updates_done = self.state.steps_trained // accum
        steps_exhausted = False

        for epoch in range(self.state.epochs_trained + 1, max_epochs + 1):
            logger.info(f"{'=' * 9} Epoch {epoch} out of {max_epochs} {'=' * 9}")
            epoch_t0 = time.time()
            training_epoch_output = []
            micro = 0
            for batch_idx, batch in enumerate(train_dataloader):
                arrays = self._place_batch(batch)
                if accum > 1:
                    grads_acc, self.model_state, loss_dict = grad_step(
                        self.params, self.model_state, grads_acc, arrays
                    )
                    micro += 1
                    if micro == accum:
                        self.params, self.opt_state, grads_acc, grad_norm = apply_step(
                            self.params, self.opt_state, grads_acc
                        )
                        micro = 0
                        updates_done += 1
                        self._log_step(loss_dict, grad_norm)
                else:
                    self.params, self.model_state, self.opt_state, loss_dict, grad_norm = fused_step(
                        self.params, self.model_state, self.opt_state, arrays
                    )
                    updates_done += 1
                    self._log_step(loss_dict, grad_norm)

                training_epoch_output.append({k: float(v) for k, v in loss_dict.items()})
                self.state.steps_trained += 1

                # step-bounded runs stop at EXACTLY max_steps optimizer
                # updates, mid-epoch if needed (SURVEY §3.5; the reference
                # only rounds max_steps up to an epoch ceiling)
                if self.max_steps > 0 and updates_done >= self.max_steps:
                    steps_exhausted = True
                    logger.info(f"Reached max_steps={self.max_steps}, stopping training.")
                    break

            self.state.epochs_trained += 1
            self.training_epoch_end(training_epoch_output)
            logger.info(f"Epoch {epoch} took {time.time() - epoch_t0:.1f}s")

            if self.debug:
                detect_overflow(self.params, tag=f"epoch{epoch}/params")

            if epoch % self.save_ckpt_interval == 0:
                self._save_checkpoint(epoch, is_best_epoch=False)

            if epoch % self.validation_interval == 0:
                logger.info("Training finished, begin validation...")
                score = self.validate(validation_dataloaders)
                # rank 0 computes the north-star (validation_epoch_end is
                # rank-0-only); every rank must run the early-stop check with
                # the SAME score: the best-epoch Orbax save inside it is a
                # collective in multi-process mode, and patience/best_score
                # must agree everywhere for resume to be consistent.
                score = broadcast_from_main(score)
                if self._run_early_stop_check(score):
                    early_stop_mark += 1
                logger.info("Validation finished.")

            if hasattr(train_dataloader, "set_epoch"):
                train_dataloader.set_epoch(epoch)

            wait_for_everyone()
            if reduce_scalar_sum(early_stop_mark) != 0:
                logger.info("Early stopping triggered, stopping training...")
                break
            if steps_exhausted:
                break
        self.ckpt_manager.wait()  # commit any in-flight async save
        self.close()

    def finetune(self, train_dataloader, validation_dataloaders, ckpt_path="best"):
        """Warm-start the weights from a checkpoint, then train with a fresh
        optimizer, schedule, and bookkeeping counters.

        The reference CLI exposes `-M finetune` (recipes/intel_ndns/
        spiking_fullsubnet/run.py:121) but raises NotImplementedError
        (run.py:100-101); this implements the documented intent: load model
        weights only — not optimizer moments or epoch/patience counters.

        The weights restore is structure-free (load_weights), so changing
        the optimizer between the base run and the finetune run is fine.
        Finetune checkpoints go to a separate checkpoints_finetune/ dir so
        the warm-start checkpoint (and the base run's best/) are never
        clobbered by a worse finetuned model.
        """
        try:
            restored = self.ckpt_manager.load_weights(ckpt_path)
            self.params = jax.tree.map(jnp.asarray, restored["params"])
            self.model_state = jax.tree.map(jnp.asarray, restored["model_state"])
            self._place_replicated()
            logger.info(f"Finetune: warm-started weights from '{ckpt_path}'.")
        except FileNotFoundError:
            if getattr(self, "_ckpt_preloaded", False):
                logger.info("Finetune: using pre-imported torch checkpoint weights.")
            else:
                raise
        self.state = TrainerState(save_max_score=self.save_max_score)
        self.optimizer = None
        self.opt_state = None
        self.lr_schedule = None
        self.resume = False
        self.ckpt_manager = CheckpointManager(
            self.checkpoints_dir.parent / "checkpoints_finetune",
            self.max_num_checkpoints,
        )
        self.train(train_dataloader, validation_dataloaders)

    def _log_step(self, loss_dict, grad_norm):
        if is_main_process():
            if self.plot_norm:
                self.writer.add_scalar("Train_Step/norm", float(grad_norm), self.state.steps_trained)
            if self.plot_lr and self.lr_schedule is not None:
                self.writer.add_scalar(
                    "Train_Step/lr", float(self.lr_schedule(self.state.steps_trained)), self.state.steps_trained
                )

    # ------------------------------------------------------------------ eval

    # How many eval steps may have host-side metric scoring still in flight
    # before the loop blocks on the oldest one. A validation_step may return
    # a concurrent.futures.Future: the device forward for batch k+1..k+N then
    # overlaps the host DNSMOS/SI-SDR scoring of batch k (the reference runs
    # them serially — SURVEY.md §3.2 hot loop (c) / §7 hard part 6). Futures
    # are resolved in submission order, so the gather collectives stay in the
    # same sequence on every process.
    metric_inflight: int = 4

    def _drain_eval_steps(self, pending, out, limit: int):
        from concurrent.futures import Future

        while len(pending) > limit:
            step_output = pending.pop(0)
            if isinstance(step_output, Future):
                step_output = step_output.result()
            out.append(gather_for_metrics(step_output))

    def validate(self, dataloaders):
        """(reference trainer.py:470-523)"""
        if not isinstance(dataloaders, list):
            dataloaders = [dataloaders]
        validation_output = []
        for dataloader_idx, dataloader in enumerate(dataloaders):
            dataloader_output: list = []
            pending: list = []
            for batch_idx, batch in enumerate(dataloader):
                pending.append(self.validation_step(batch, batch_idx, dataloader_idx))
                self._drain_eval_steps(pending, dataloader_output, self.metric_inflight)
            self._drain_eval_steps(pending, dataloader_output, 0)
            validation_output.append(dataloader_output)
        if is_main_process():
            return self.validation_epoch_end(validation_output)
        return None

    def test(self, dataloaders, ckpt_path="best"):
        """(reference trainer.py:525-563)"""
        if not isinstance(dataloaders, list):
            dataloaders = [dataloaders]
        if self.optimizer is None:
            self._build_optimizer(max_steps=1)
        self._load_eval_weights(ckpt_path)
        test_output = []
        for dataloader_idx, dataloader in enumerate(dataloaders):
            dataloader_out: list = []
            pending: list = []
            for batch_idx, batch in enumerate(dataloader):
                pending.append(self.test_step(batch, batch_idx, dataloader_idx))
                self._drain_eval_steps(pending, dataloader_out, self.metric_inflight)
            self._drain_eval_steps(pending, dataloader_out, 0)
            test_output.append(dataloader_out)
        result = None
        if is_main_process():
            result = self.test_epoch_end(test_output)
        self.close()
        return result

    def predict(self, dataloaders, ckpt_path="best"):
        """(reference trainer.py:565-595)"""
        if not isinstance(dataloaders, list):
            dataloaders = [dataloaders]
        if self.optimizer is None:
            self._build_optimizer(max_steps=1)
        self._load_eval_weights(ckpt_path)
        for dataloader_idx, dataloader in enumerate(dataloaders):
            for batch_idx, batch in enumerate(dataloader):
                self.predict_step(batch, batch_idx, dataloader_idx)
        self.close()

    @property
    def metric_pool(self):
        """Host-side metric scoring pool shared by all recipe trainers.

        validation_step/test_step implementations submit their host scoring
        (SI-SDR, DNSMOS, STOI, ...) here and return the Future; the eval
        loop above resolves them in order while the device runs ahead on
        the next batches (the reference scores serially — SURVEY §3.2 hot
        loop (c)). 2 workers: onnxruntime sessions are thread-safe for
        run() and numpy/ORT release the GIL. Lazy, so runs that never
        evaluate start no threads; close() shuts it down.
        """
        if getattr(self, "_metric_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._metric_pool = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="val-metrics")
        return self._metric_pool

    def close(self):
        """Release per-run host resources (thread pools, sessions).

        Called at the end of train/test/predict; idempotent, and subclasses
        that allocate lazily may be used again after close().
        """
        if getattr(self, "_metric_pool", None) is not None:
            self._metric_pool.shutdown(wait=True)
            self._metric_pool = None
