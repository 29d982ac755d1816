"""Host↔device transfer hardening.

Big single-message transfers are the widest window for interconnect
stalls: behind a multiplexed host↔device tunnel (the dev relay pipes all
traffic through one framed stream with head-of-line blocking) a 200 MB
device_put can wedge every in-flight request if the stream hiccups
mid-message. ``chunked_device_put`` bounds the in-flight message size by
uploading row slices and draining each before the next, then concatenating
on device — trading a few dispatch round-trips for bounded-size messages.

On a healthy local DMA path the overhead is negligible (the copy is
bandwidth-bound either way); the chunking only matters when the transport
is fragile, which is exactly when it pays for itself.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_CHUNK_BYTES = 32 * 1024 * 1024


def chunked_device_put(
    x: np.ndarray,
    sharding=None,
    chunk_bytes: int = _DEFAULT_CHUNK_BYTES,
    block: bool = True,
):
    """device_put ``x`` in row-slice messages of ≤ ``chunk_bytes``.

    Row-sharded placements can't be assembled from replicated slices without
    a reshard, so sharded puts go through in one message (they are also the
    rarer, mesh-local path). 1-D and small arrays likewise.
    """
    x = np.ascontiguousarray(x)
    if (
        sharding is not None
        or x.ndim < 2
        or x.nbytes <= chunk_bytes
    ):
        out = jax.device_put(x, sharding) if sharding is not None else jnp.asarray(x)
        if block:
            jax.block_until_ready(out)
        return out
    rows_per = max(1, int(chunk_bytes // max(1, x.nbytes // x.shape[0])))
    parts = []
    for lo in range(0, x.shape[0], rows_per):
        p = jnp.asarray(x[lo : lo + rows_per])
        p.block_until_ready()  # drain the transport before the next message
        parts.append(p)
    # jitted concat: an EAGER op on a remote-dispatch backend costs a full
    # relay round-trip per op (and big eager ops are the stall window this
    # module exists to avoid)
    out = (
        jax.jit(lambda *ps: jnp.concatenate(ps, axis=0))(*parts)
        if len(parts) > 1
        else parts[0]
    )
    if block:
        out.block_until_ready()
    return out
