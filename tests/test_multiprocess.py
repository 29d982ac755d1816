"""Multi-process runtime: a real 2-process JAX cluster on CPU.

The reference's multi-process story is a dead DDP stub (model_utils.py:135-142,
behind ``if False:``). Ours is parallel/distributed.initialize + global-batch
jit over a mesh spanning every process's devices. Everything below runs an
ACTUAL 2-process cluster (gloo collectives between processes — the CPU stand-in
for ICI/DCN): each process contributes 4 virtual CPU devices, the full
production train step + lax.scan window runs over the global 8-device
(data x model) mesh, and the results must be

  (a) coherent: both processes observe identical replicated outputs, and
  (b) topology-invariant: equal to the same computation on a single-process
      8-device mesh (the driver-dryrun path) — the "multi-host-ready
      unchanged" claim of parallel/distributed.py, measured.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env(port: int, pid: int, nproc: int) -> dict:
    env = dict(os.environ)
    # the worker pins its own platform/device-count; drop the parent's
    env.pop("XLA_FLAGS", None)
    env["COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env["NUM_PROCESSES"] = str(nproc)
    env["PROCESS_ID"] = str(pid)
    return env


@pytest.fixture(scope="module")
def cluster_results():
    port = _free_port()
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py")],
            env=_clean_env(port, pid, nproc),
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
            outs.append((out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for out, err in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        assert lines, f"no JSON from worker:\n{out}\n{err[-2000:]}"
        results.append(json.loads(lines[-1]))
    return sorted(results, key=lambda r: r["process_id"])


class TestMultiProcessRuntime:
    def test_cluster_topology(self, cluster_results):
        r0, r1 = cluster_results
        assert [r0["process_id"], r1["process_id"]] == [0, 1]
        for r in cluster_results:
            assert r["num_processes"] == 2
            assert r["global_devices"] == 8
            assert r["mesh"] == {"data": 4, "model": 2}

    def test_replicated_outputs_coherent_across_processes(self, cluster_results):
        r0, r1 = cluster_results
        # replicated arrays must read back identically from either process
        assert r0["loss"] == r1["loss"]
        assert r0["scan_losses"] == r1["scan_losses"]
        assert r0["mem_rows"] == r1["mem_rows"]

    def test_matches_single_process_mesh(self, cluster_results):
        """The same global computation on this (single) process's own
        8-device mesh — multi-process partitioning must not change the
        numbers beyond reduction-order noise."""
        import jax

        import __graft_entry__ as g
        from vqwild_tpu.parallel.mesh import make_mesh
        from vqwild_tpu.train.step import create_train_state, make_optimizer

        nclass, semantic_dim, crop = 200, 200, 32
        model, params, state_vars, sem = g._build(
            nclass=nclass, semantic_dim=semantic_dim, crop=crop
        )
        tx = make_optimizer(1e-4, 1e-5, steps_per_epoch=10, lr_decay_epoch=9)
        state0 = create_train_state(
            model, params, state_vars, tx, jax.random.PRNGKey(1)
        )
        mesh = make_mesh((4, 2), ("data", "model"))
        loss, traj, mem_rows = g._train_block(
            mesh, model, state0, tx, sem, nclass, crop
        )

        r0 = cluster_results[0]
        # pre-update forward losses: only reduction order differs between
        # gloo (inter-process ring) and the intra-process reduction
        np.testing.assert_allclose(r0["loss"], loss, rtol=1e-4)
        traj = np.asarray(traj)
        np.testing.assert_allclose(r0["scan_losses"][0], traj[0], rtol=1e-4)
        # post-update loss: the first optimizer step (random init, loss
        # halves in one step) amplifies the reduction-order noise —
        # observed ~2e-4 relative; anything beyond ~0.5% would mean a real
        # semantics difference (wrong psum, missing rows, skewed RNG)
        np.testing.assert_allclose(r0["scan_losses"][-1], traj[-1], rtol=5e-3)
        assert r0["mem_rows"] == mem_rows
