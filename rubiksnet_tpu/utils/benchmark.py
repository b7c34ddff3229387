"""Reliable device timing under async dispatch / tunneled runtimes.

Host-side timing of tunneled TPU runtimes is unreliable: dispatch returns
early and a device->host fetch carries a large fixed latency. We therefore
time N on-device iterations chained by a data dependency inside one jitted
computation (a scalar derived from iteration i's output perturbs iteration
i+1's input by exactly zero), and difference two iteration counts to cancel
the fixed dispatch+fetch overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _measure_diff(f_lo, f_hi, example, n_lo: int, n_hi: int, repeats: int) -> float:
    """Run compiled chained loops, difference PAIRED wall times.

    Each attempt runs the lo loop and the hi loop back-to-back and records
    their difference: both sides of one attempt share the chip phase, so the
    runtime's minutes-scale drift (up to 4x, docs/PERF_NOTES.md) divides out
    of the pair instead of corrupting the estimate. The estimator is the
    MEDIAN of the per-attempt differences — min-of-mins across attempts (the
    previous scheme) could pair a slow-phase lo with a fast-phase hi and
    imply physically impossible throughput (observed: 12.7k clips/s for a
    program whose HBM floor is ~900).

    Individual differences still go negative under the ~0.5 s fetch-latency
    jitter; sampling continues (up to 3x the requested repeats) until the
    median clears zero."""

    def run(f):
        # The chained loops return a SCALAR digest of the final carry (see
        # _scalar_chain): fetching it forces completion at ~zero transfer
        # cost. Fetching the carry itself (e.g. a 154 MB bf16 video batch at
        # bs64) pushed a multi-second, highly variable tunnel transfer into
        # every timed region — the dominant noise source behind the
        # "impossible throughput" samples of rounds 1-4.
        r = f(example)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]

    run(f_lo)  # compile both
    run(f_hi)
    diffs, lo_times, hi_times = [], [], []
    for attempt in range(3 * repeats):
        t0 = time.perf_counter()
        run(f_lo)
        t1 = time.perf_counter()
        run(f_hi)
        t2 = time.perf_counter()
        lo_times.append(t1 - t0)
        hi_times.append(t2 - t1)
        diffs.append((t2 - t1) - (t1 - t0))
        if attempt + 1 >= repeats and float(np.median(diffs)) > 0:
            break
    diff = float(np.median(diffs))
    if diff <= 0:
        # Sub-jitter regime (half the paired diffs negative): the loop body
        # is so short that additive scheduling noise dominates. There the
        # noise is one-sided (delays), so min-of-each-side is the mode
        # estimator; phase drift cannot matter at these durations.
        diff = min(hi_times) - min(lo_times)
    if diff <= 0:
        raise RuntimeError(
            f"chained timing inconclusive: median paired diff "
            f"{float(np.median(diffs)):.3f}s over {len(diffs)} attempts "
            f"— increase n_hi"
        )
    return diff / (n_hi - n_lo)


def _scalar_digest(carry):
    """Reduce a loop carry to one f32 scalar that depends on every leaf, so
    fetching the loop result costs one scalar transfer instead of shipping
    the full carry (possibly hundreds of MB) through the tunnel."""
    return sum(
        jnp.sum(leaf.astype(jnp.float32))
        for leaf in jax.tree_util.tree_leaves(carry)
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )


def time_chained(
    fn: Callable,
    example_input: jax.Array,
    n_lo: int = 2,
    n_hi: int = 32,
    repeats: int = 3,
    max_n_hi: int = 128,
) -> float:
    """Seconds per fn() application, measured on device.

    fn: input array -> output pytree. Iterations are serialized by adding
    (0 * first-output-leaf-sum) to the carried input.

    If the (n_hi - n_lo)-iteration delta does not clear the tunnel's
    fetch-latency jitter (observed at ~1 s), n_hi jumps 4x — once, up to
    max_n_hi — before giving up. Each retry compiles a longer chained loop
    (minutes for the big models), so the ladder is deliberately short;
    fast functions get their longer chains, slow ones fail fast.
    """

    def chained(n):
        def body(i, v):
            out = fn(v)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return v + (leaf.sum() * 0).astype(v.dtype)

        return jax.jit(lambda v: _scalar_digest(lax.fori_loop(0, n, body, v)))

    err = None
    while True:
        try:
            return _measure_diff(
                chained(n_lo), chained(n_hi), example_input, n_lo, n_hi,
                repeats
            )
        except RuntimeError as e:
            err = e
            if n_hi >= max_n_hi:
                raise
            n_hi = min(n_hi * 4, max_n_hi)


class ChainedTimer:
    """Precompiled chained-loop timer for interleaved drift studies.

    `time_chained` builds (traces + compiles) fresh jitted loops on every
    call, which makes round-robin A/B harnesses pay a full retrace per
    config per round — on this runtime that is the dominant cost. This
    class pays trace+compile ONCE at construction, then `sample()` draws
    an execution-only timing sample; call it once per interleave round.
    """

    def __init__(self, fn: Callable, example_input: jax.Array,
                 n_lo: int = 1, n_hi: int = 32):
        def body(i, v):
            out = fn(v)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return v + (leaf.sum() * 0).astype(v.dtype)

        def chained(n):
            return jax.jit(
                lambda v: _scalar_digest(lax.fori_loop(0, n, body, v)))

        self._lo, self._hi = chained(n_lo), chained(n_hi)
        self._n_lo, self._n_hi = n_lo, n_hi
        self._example = example_input
        # Compile both loops now, outside any timed region.
        for f in (self._lo, self._hi):
            r = f(example_input)
            np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()

    def sample(self, repeats: int = 2) -> float:
        """One seconds-per-application sample (execution only).

        Raises RuntimeError when the iteration delta does not clear the
        fetch jitter; callers in interleave loops should record the miss
        and move on rather than escalate n_hi mid-study (which would make
        rounds incomparable).
        """
        return _measure_diff(self._lo, self._hi, self._example,
                             self._n_lo, self._n_hi, repeats)


def time_chained_carry(
    fn: Callable,
    carry,
    n_lo: int = 2,
    n_hi: int = 16,
    repeats: int = 3,
    max_n_hi: int = 64,
) -> float:
    """Seconds per fn() application for a self-chaining step.

    fn: carry pytree -> carry pytree (e.g. a train step closed over its
    batch). Iterations serialize naturally through the carried state, so no
    artificial dependency injection is needed. n_hi auto-doubles when the
    delta does not clear the fetch jitter (see time_chained).
    """

    def chained(n):
        return jax.jit(
            lambda c: _scalar_digest(
                lax.fori_loop(0, n, lambda i, c: fn(c), c)))

    while True:
        try:
            return _measure_diff(
                chained(n_lo), chained(n_hi), carry, n_lo, n_hi, repeats
            )
        except RuntimeError:
            if n_hi >= max_n_hi:
                raise
            n_hi = min(n_hi * 4, max_n_hi)
