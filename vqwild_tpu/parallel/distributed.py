"""Multi-host runtime initialization.

The reference has no working distributed backend (its DDP stub is dead code
behind ``if False:``, model_utils.py:135-142). The TPU-native equivalent is
the JAX distributed runtime: one process per host, all devices form one
global mesh, collectives ride ICI within a slice and DCN across slices.

Call ``initialize()`` once at process start on multi-host deployments
(single-host/single-process runs need nothing). All framework code is written
against global-batch jit semantics, so it is multi-host-ready unchanged —
meshes built by parallel.mesh.make_mesh simply see more devices.
"""

from __future__ import annotations

import os
from typing import Optional

from vqwild_tpu.core.logging import get_logger

log = get_logger("parallel.distributed")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata
    auto-detection when all args are None). Returns True if a multi-process
    runtime was started."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # single-process (or TPU pod auto-detect handled by jax itself)
        log.info("single-process runtime: %d local devices", jax.local_device_count())
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed runtime: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.device_count(),
    )
    return True


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this barrier.

    Pure coordination-service RPC — no device collectives — so it is safe
    (and useful) to call while peers are still *compiling*: cross-process
    collective contexts have a short fixed handshake timeout (gloo's
    key-value exchange is 30 s on CPU), so a program whose compile times
    skew across processes must be compiled ahead of time and then entered
    together. AOT-compile, barrier, execute. No-op in single-process
    runtimes."""
    # jax exposes no public coordination-service barrier; the private path
    # is guarded so a jax upgrade fails loudly here instead of reintroducing
    # the silent handshake-timeout race this barrier exists to prevent
    try:
        from jax._src import distributed as _dist

        client = _dist.global_state.client
        wait = None if client is None else client.wait_at_barrier
    except (ImportError, AttributeError) as e:  # pragma: no cover
        raise RuntimeError(
            "parallel.distributed.barrier needs jax's internal coordination "
            "client (jax._src.distributed.global_state.client.wait_at_barrier); "
            "this jax version moved it — update the import here"
        ) from e
    if wait is None:
        return  # single-process runtime: nothing to synchronize
    wait(name, timeout_ms)
