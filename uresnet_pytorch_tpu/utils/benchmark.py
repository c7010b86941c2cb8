"""Benchmark timing utilities for the axon-tunneled TPU.

`block_until_ready` is unreliable through the tunnel, so all timing runs the
step under test inside ONE jitted `lax.fori_loop` with a *dynamic* trip
count (single compilation), chains iterations through a data dependency so
nothing can be elided or overlapped, and anchors the wall clock on fetching
a scalar to host (which does block). Per-iteration time is the slope between
two trip counts, cancelling the constant ~28 ms dispatch+fetch overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def timed_step(step: Callable, args, n1: int = 1, n2: int = 5) -> float:
    """Seconds per call of `step(chain, *args) -> f32 scalar`.

    `chain` is a float32 scalar the step must mix into its computation AND
    whose returned value must depend on the step's output (e.g.
    ``out.sum() * 1e-30``) — that chain serializes the loop iterations.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(args, n):
        def body(i, carry):
            chain, acc = carry
            s = step(chain, *args)
            return (s, acc + s)
        _, acc = jax.lax.fori_loop(0, n, body,
                                   (jnp.float32(0.0), jnp.float32(0.0)))
        return acc

    times = {}
    for n in (n1, n2):
        np.asarray(f(args, n))  # compile (first call) + warm
        t0 = time.perf_counter()
        np.asarray(f(args, n))
        times[n] = time.perf_counter() - t0
    return max(times[n2] - times[n1], 1e-9) / (n2 - n1)


def timed_train(step_fn: Callable, state, batch, n1: int = 1,
                n2: int = 5) -> float:
    """Seconds per training step. step_fn(state, batch) -> (state, metrics);
    the state carry IS the chained dependency."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(state, batch, n):
        def body(i, carry):
            st, acc = carry
            st2, metrics = step_fn(st, batch)
            return (st2, acc + metrics["loss"].astype(jnp.float32))
        st, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return acc

    times = {}
    for n in (n1, n2):
        np.asarray(f(state, batch, n))
        t0 = time.perf_counter()
        np.asarray(f(state, batch, n))
        times[n] = time.perf_counter() - t0
    return max(times[n2] - times[n1], 1e-9) / (n2 - n1)
