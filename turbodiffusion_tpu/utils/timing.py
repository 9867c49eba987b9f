"""Device-honest timing helpers.

On some TPU transports (the axon tunnel in this environment),
`jax.block_until_ready` returns immediately without waiting for device
execution — only a device->host fetch synchronizes. Measured: 20 chained
8192^2 bf16 matmuls (~112 ms of MXU work) "complete" in 0.1 ms under
block_until_ready but take the expected 148 ms when a scalar is fetched.

All benchmarks therefore sync by fetching one element of the result. The
fetch adds one tunnel round-trip (~40 ms here); `measure` amortizes it by
queueing `iters` async dispatches back-to-back and fetching once.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def fetch_sync(result) -> None:
    """Block until `result` is computed, by fetching one scalar of it."""
    leaf = jax.tree_util.tree_leaves(result)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def measure(fn, *args, iters: int = 3, warmup: int = 1) -> float:
    """Median-of-one honest wall time: queue `iters` dispatches, fetch once,
    divide. Returns seconds per call (RTT amortized over iters)."""
    for _ in range(warmup):
        fetch_sync(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    fetch_sync(r)
    return (time.perf_counter() - t0) / iters


def measure_best(fn, *args, n: int = 3, iters: int = 1) -> float:
    """Best-of-n `measure`. Use iters>1 for sub-100ms computations so the
    tunnel RTT doesn't dominate."""
    fetch_sync(fn(*args))
    return min(measure(fn, *args, iters=iters, warmup=0) for _ in range(n))
