"""Worker process for the multi-process runtime test (test_multiprocess.py).

Runs under ``python tests/mp_worker.py`` with the cluster described by the
COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID environment variables — the
exact env-var contract of vqwild_tpu.parallel.distributed.initialize — and a
4-device virtual CPU platform per process. It joins the cluster, builds the
same (data x model) mesh over the GLOBAL device set that the driver dryrun
uses, runs the full production train step + scanned window on it
(__graft_entry__._train_block), and emits one JSON line with the replicated
results so the parent can assert cross-process coherence and single-process
equality.

The reference has no working multi-process backend at all (its DDP stub is
dead code behind ``if False:``, model_utils.py:135-142); this worker is the
TPU-native replacement's proof: one process per host, global-batch jit,
collectives between processes (gloo on CPU here, ICI/DCN on real pods).
"""

import json
import os
import sys

# Platform must be pinned before jax builds a backend: the axon sitecustomize
# pre-registers a TPU plugin, and the parent's conftest forces 8 CPU devices —
# this worker needs exactly NUM_PROCESSES x 4 = 8 global devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    from vqwild_tpu.parallel import distributed

    started = distributed.initialize()  # env-var path
    assert started, "expected a multi-process runtime"
    nproc = jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

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

    mesh = make_mesh((jax.device_count() // 2, 2), ("data", "model"))
    loss, traj, mem_rows = g._train_block(
        mesh, model, state0, tx, sem, nclass, crop,
        sync=distributed.barrier,
    )

    print(
        json.dumps(
            {
                "process_id": jax.process_index(),
                "num_processes": nproc,
                "global_devices": jax.device_count(),
                "mesh": dict(mesh.shape),
                "loss": loss,
                "scan_losses": [float(x) for x in np.asarray(traj)],
                "mem_rows": mem_rows,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
