"""Worker: FULL Trainer e2e across real processes (run via subprocess).

Drives runtime/trainer.py end to end under jax.distributed — the
multi-host equivalent of the reference's `accelerate launch run.py -M train`
with ddp_*.yaml (machine_rank/num_machines,
recipes/intel_ndns/spiking_fullsubnet_freeze_phase/ddp_four_cards.yaml):

  phase 1: train 2 epochs on the tiny synthetic recipe (loader sharded
           across processes, batch sharded over the global device mesh,
           periodic validation with cross-process metric gather, rank-0
           checkpoint rotation + best tracking)
  phase 2: a FRESH run.main invocation with -R resumes from `latest`
           (simulated crash recovery): counters restore on every rank,
           training continues to max_epochs
  phase 3: `-M test` on the best checkpoint
  early stop: patience exhausted on the monitor -> all ranks leave the
           epoch loop together (reduce_scalar_sum semantics,
           audiozen/trainer.py:460-468)

Invoked as:
    python multiprocess_trainer_worker.py <coordinator> <num> <pid> <tmpdir>
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

RECIPE_DIR = Path(__file__).parent.parent / "recipes" / "intel_ndns" / "spiking_fullsubnet"


def main():
    coordinator, num_processes, process_id, tmpdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes

    # every rank runs in the same working tree (shared filesystem, like a
    # pod's NFS exp dir); the recipe writes exp/ artifacts there
    os.chdir(tmpdir)
    if process_id == 0:
        shutil.copy(RECIPE_DIR / "tiny_synthetic.toml", "tiny_synthetic.toml")
    from spiking_fullsubnet_tpu.parallel.dist import wait_for_everyone

    wait_for_everyone("toml-copied")

    sys.path.insert(0, str(RECIPE_DIR))
    import run

    # ---- phase 1: fresh 2-epoch train with validation + checkpoints ----
    t = run.main(["-C", "tiny_synthetic.toml", "-M", "train"])
    assert t.state.epochs_trained == 2, t.state.epochs_trained
    assert t.state.best_score > -100
    wait_for_everyone("train-done")
    exp = Path(tmpdir) / "exp" / "tiny_synthetic"
    assert (exp / "checkpoints" / "best").exists()
    assert (exp / "checkpoints" / "epoch_0002").exists()
    if process_id == 0:
        # metrics CSVs are rank-0-only artifacts
        assert list((exp / "metrics").glob("dl_0_epoch_2_*_mean.csv"))
    best_score_p1 = t.state.best_score
    t.close()

    # ---- phase 2: resume-from-latest in a fresh Trainer (crash recovery).
    # max_epochs already reached, so counters restore and no extra epoch
    # runs — exactly the reference's `-R` semantics (run.py:124-128).
    sys.modules.pop("run", None)
    sys.modules.pop("trainer", None)
    import run as run2

    t2 = run2.main(["-C", "tiny_synthetic.toml", "-M", "train", "-R"])
    assert t2.state.epochs_trained == 2, t2.state.epochs_trained
    # `latest` is written BEFORE that epoch's validation (reference
    # trainer.py:445-448 ordering), so its best_score trails the final one
    # by at most the last validation's improvement
    assert t2.state.best_score > -100
    assert t2.state.best_score <= best_score_p1 + 1e-6
    wait_for_everyone("resume-done")
    t2.close()

    # ---- phase 3: test mode on the best checkpoint (all ranks share the
    # eval loop; rank 0 writes the report) ----
    sys.modules.pop("run", None)
    sys.modules.pop("trainer", None)
    import run as run3

    t3 = run3.main(["-C", "tiny_synthetic.toml", "-M", "test", "--ckpt_path", "best"])
    assert t3.state.epochs_trained == 2
    t3.close()

    wait_for_everyone("done")
    print(f"TRAINER_WORKER_OK {process_id}", flush=True)


if __name__ == "__main__":
    main()
