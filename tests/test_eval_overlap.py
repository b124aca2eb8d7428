"""Async host-metric overlap in validate/test loops.

The base trainer lets validation_step return a concurrent.futures.Future so
host-side scoring (DNSMOS/SI-SDR — the reference's serial validation hot
loop, SURVEY.md §3.2(c)) overlaps the device forward of later batches, while
futures are resolved in submission order so multi-process gather collectives
stay aligned (runtime/trainer.py validate()/_drain_eval_steps).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from spiking_fullsubnet_tpu.runtime.trainer import Trainer


class _OverlapStub:
    """Minimal host for the base trainer's eval-loop machinery."""

    metric_inflight = Trainer.metric_inflight
    _drain_eval_steps = Trainer._drain_eval_steps
    validate = Trainer.validate

    def __init__(self, n_batches, score_s):
        self.pool = ThreadPoolExecutor(max_workers=2)
        self.score_s = score_s
        self.events = []  # (kind, batch_idx, t)
        self.batches = list(range(n_batches))

    def validation_step(self, batch, batch_idx, dataloader_idx=0):
        self.events.append(("submit", batch_idx, time.monotonic()))

        def score():
            time.sleep(self.score_s)
            self.events.append(("scored", batch_idx, time.monotonic()))
            return [{"si_sdr": float(batch_idx)}]

        return self.pool.submit(score)

    def validation_epoch_end(self, outputs):
        return outputs


def test_dereverb_validation_step_returns_future():
    """The dereverb recipe (VERDICT r03 weak #6: it scored synchronously)
    now submits host scoring to the base trainer's shared metric_pool."""
    from concurrent.futures import Future

    import numpy as np

    from spiking_fullsubnet_tpu.recipes.dereverb import DereverbTrainer

    t = DereverbTrainer.__new__(DereverbTrainer)  # skip heavy __init__
    t.params = t.model_state = None
    t._eval_forward = lambda p, s, mix: np.asarray(mix) * 0.5
    from spiking_fullsubnet_tpu.metrics import SISDR

    t.si_sdr = SISDR()
    t.dns_mos = None
    rng = np.random.default_rng(0)
    batch = (rng.standard_normal((2, 1600)).astype(np.float32),
             rng.standard_normal((2, 1600)).astype(np.float32))
    fut = t.validation_step(batch, 0)
    assert isinstance(fut, Future)
    rows = fut.result()
    assert len(rows) == 2 and "si_sdr" in rows[0]
    t.close()

    # separation recipe likewise
    from spiking_fullsubnet_tpu.recipes.separation import SeparationTrainer

    s = SeparationTrainer.__new__(SeparationTrainer)
    s.params = s.model_state = None
    s._eval_forward = lambda p, st, mix: np.repeat(
        np.asarray(mix)[:, None] * 0.5, 2, axis=1)  # [B, 2 spk, T]
    s.si_sdr = SISDR()
    s.dns_mos = None
    spk_batch = (rng.standard_normal((2, 1600)).astype(np.float32),
                 rng.standard_normal((2, 2, 1600)).astype(np.float32))
    fut = s.validation_step(spk_batch, 0)
    assert isinstance(fut, Future)
    assert len(fut.result()) == 2
    s.close()


def test_futures_resolved_in_submission_order_and_overlapped():
    n, score_s = 8, 0.05
    stub = _OverlapStub(n, score_s)
    t0 = time.monotonic()
    outputs = stub.validate([stub.batches])
    wall = time.monotonic() - t0

    # results ordered by batch despite concurrent scoring
    flat = [row["si_sdr"] for step in outputs[0] for row in step]
    assert flat == [float(i) for i in range(n)]

    # scoring of batch k overlapped submission of later batches: the loop
    # must not have serialized (serial floor = n * score_s with 2 workers
    # halving it; generous bound to stay robust on loaded CI hosts)
    assert wall < n * score_s * 0.9, f"no overlap: wall={wall:.3f}s"

    # the in-flight window bounds memory: batch k+metric_inflight+1 is never
    # submitted before batch k resolved
    submits = {i: t for kind, i, t in stub.events if kind == "submit"}
    scoreds = {i: t for kind, i, t in stub.events if kind == "scored"}
    win = stub.metric_inflight
    for k in range(n - win - 1):
        assert scoreds[k] <= submits[k + win + 1] + 1e-3


def test_plain_list_step_outputs_still_work():
    stub = _OverlapStub(3, 0.0)
    stub.validation_step = lambda batch, bi, di=0: [{"si_sdr": float(bi)}]
    outputs = stub.validate([stub.batches])
    flat = [row["si_sdr"] for step in outputs[0] for row in step]
    assert flat == [0.0, 1.0, 2.0]
