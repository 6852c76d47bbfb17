"""Device-time measurement that survives high-latency dispatch paths.

Wall-clock timing of a single jitted call is wrong on tunneled/remote TPU
platforms: one dispatch + scalar readback costs ~20-25 ms regardless of the
kernel, so a 60 us decode matmul measures as 5% of speed-of-light when it is
really at 85%. The fix is structural, not statistical:

  * run the op N times inside ONE jitted ``lax.scan`` so the program is
    dispatched once;
  * thread the scan carry into the op's input (a zero-in-practice
    perturbation XLA cannot prove is zero) so the loop body is not hoisted
    as loop-invariant — with a hoisted body every iteration after the first
    is free and the measurement collapses to the dispatch floor;
  * measure the same scan with a trivial body to get the per-call floor and
    subtract it.

``measure`` packages all three.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _perturb(x: jax.Array, c: jax.Array) -> jax.Array:
    """Data-dependent zero: keeps dtype, defeats loop-invariant hoisting."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x + (c * 1e-30).astype(x.dtype)
    return x + (c * 1e-30).astype(x.dtype)


def scan_time(
    fn: Callable[..., jax.Array],
    args: Sequence[jax.Array],
    *,
    iters: int = 500,
    reps: int = 3,
) -> float:
    """Total seconds for one dispatch of ``iters`` carry-dependent runs of
    ``fn(*args)`` (first arg perturbed by the carry), averaged over reps."""

    @jax.jit
    def many(first, *rest):
        def body(c, _):
            r = fn(_perturb(first, c), *rest)
            return jnp.sum(r, dtype=jnp.float32) * 1e-30, None

        out, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return out

    float(many(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(many(*args))  # scalar readback is the only reliable fence
    return (time.perf_counter() - t0) / reps


def dispatch_floor(iters: int = 500, reps: int = 3) -> float:
    """Per-call overhead of the scan harness itself (seconds)."""
    x = jnp.ones((8, 128), jnp.bfloat16)
    return scan_time(lambda x: x * 2.0, [x], iters=iters, reps=reps)


def measure(
    fn: Callable[..., jax.Array],
    args: Sequence[jax.Array],
    *,
    iters: int = 500,
    reps: int = 3,
    floor: float | None = None,
) -> float:
    """Per-iteration device seconds of ``fn(*args)``, floor-subtracted."""
    if floor is None:
        floor = dispatch_floor(iters=iters, reps=reps)
    total = scan_time(fn, args, iters=iters, reps=reps)
    return max(total - floor, 0.0) / iters
