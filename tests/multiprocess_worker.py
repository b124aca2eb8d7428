"""Worker for the multi-process jax.distributed tests (run via subprocess).

Exercises the multihost code paths that single-process tests cannot reach
(reference semantics: audiozen/trainer.py:460-468,511):
  - reduce_scalar_sum: one rank raises the early-stop mark, all ranks see it
  - gather_for_metrics: rank-major ordering and content
  - loader sharding: disjoint cover + wrap padding
  - multi-process Orbax checkpoint save/load round trip

Invoked as:
    python multiprocess_worker.py <coordinator> <num_processes> <process_id> <tmpdir>
"""

from __future__ import annotations

import sys


def main():
    coordinator, num_processes, process_id, tmpdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    # CPU cross-process collectives need an explicit implementation (gloo);
    # without it every process forms its own single-process backend.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()

    import jax.numpy as jnp
    import numpy as np

    from spiking_fullsubnet_tpu.parallel.dist import (
        gather_for_metrics,
        is_main_process,
        reduce_scalar_sum,
        wait_for_everyone,
    )

    # ---- early-stop mark propagation: only rank 1 stops, all must see it
    mark = 1.0 if process_id == 1 else 0.0
    total = reduce_scalar_sum(mark)
    assert total == 1.0, f"rank {process_id}: reduce_scalar_sum -> {total}"
    assert reduce_scalar_sum(0.0) == 0.0

    # ---- gather_for_metrics: rank-major order, content preserved
    local = [{"si_sdr": float(process_id * 100 + i), "loss": float(i)} for i in range(3)]
    gathered = gather_for_metrics(local)
    assert len(gathered) == 3 * num_processes, len(gathered)
    for p in range(num_processes):
        for i in range(3):
            got = gathered[p * 3 + i]
            assert got["si_sdr"] == p * 100 + i, (p, i, got)
            assert got["loss"] == float(i)

    # ---- loader sharding: disjoint cover (n divisible) + wrap padding
    from spiking_fullsubnet_tpu.data.loader import DataLoader

    class Rangeset:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return np.asarray([i], np.int64)

    for n in (8, 9):  # 9 exercises wrap padding with 2 processes
        loader = DataLoader(Rangeset(n), batch_size=2, shuffle=False,
                            shard_across_processes=True, drop_last=False)
        seen = [int(x) for batch in loader for x in np.asarray(batch).ravel()]
        arr = jnp.asarray([len(seen)], jnp.int32)
        from jax.experimental import multihost_utils

        all_seen = multihost_utils.process_allgather(
            np.asarray(seen + [-1] * (16 - len(seen)), np.int64))
        if is_main_process():
            flat = [int(v) for row in all_seen for v in row if v >= 0]
            per = -(-n // num_processes)
            assert len(flat) == per * num_processes, (n, flat)
            assert set(flat) == set(range(n)), (n, sorted(set(flat)))
            if n % num_processes == 0:
                assert len(flat) == len(set(flat)), "expected disjoint shards"
        del arr

    # ---- simulated 2-host DCN topology: mesh ('host', 'data') where 'host'
    # spans process groups (DCN-like) and 'data' the within-process devices
    # (ICI-like); a cross-process reduction over the global array must see
    # every device's contribution exactly once.
    if num_processes >= 4 and jax.device_count() >= 4 and jax.device_count() % 2 == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.array(jax.devices()).reshape(2, -1)  # 2 "hosts" x rest
        mesh = Mesh(devs, ("host", "data"))
        rows_per_dev = 4
        local = np.stack(
            [np.full((rows_per_dev,), d.id, np.float32) for d in jax.local_devices()]
        )  # [local_devices, rows_per_dev]
        gshape = (jax.device_count(), rows_per_dev)
        arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(("host", "data"))), local, gshape)
        total = jax.jit(
            lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
        )(arr)
        expect = sum(d.id for d in jax.devices()) * rows_per_dev
        assert float(total) == expect, (float(total), expect)

    # ---- multi-process Orbax checkpoint round trip
    from spiking_fullsubnet_tpu.runtime.checkpoint import CheckpointManager
    from spiking_fullsubnet_tpu.runtime.trainer_state import TrainerState

    tree = {
        "params": {"w": jnp.arange(8, dtype=jnp.float32) * 3.0},
        "model_state": {"bn": jnp.ones((4,), jnp.float32)},
    }
    mgr = CheckpointManager(tmpdir + "/checkpoints")
    st = TrainerState()
    st.epochs_trained = 5
    st.best_score = 12.5
    mgr.save(5, tree, st, is_best_epoch=False)
    mgr.wait()
    wait_for_everyone("after-save")

    st2 = TrainerState()
    zero = jax.tree.map(jnp.zeros_like, tree)
    restored = mgr.load("latest", zero, st2)
    assert st2.epochs_trained == 5 and st2.best_score == 12.5
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(8, dtype=np.float32) * 3.0)

    wait_for_everyone("done")
    print(f"WORKER_OK {process_id}", flush=True)


if __name__ == "__main__":
    main()
