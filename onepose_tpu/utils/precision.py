"""fp32 matmul precision for geometry solvers.

TPU matmuls default to bf16 multiplications (~8e-3 relative error). That is
the right trade for the neural nets (the serving pipeline opts into bf16
deliberately), but it is NOT acceptable for the metric geometry path:
RANSAC-PnP measured 1.76 cm translation error on chip vs 0.03 cm on the fp32
CPU backend on identical data — a 35x accuracy loss that would eat the whole
1cm-1deg recall budget. The geometry solvers' matmuls are tiny ([N,3]x[3,3]
reprojections, 6x6 normal equations), so full-precision accumulation there
costs nothing measurable end-to-end.

`fp32_matmuls` wraps a public entry point so that every dot/conv traced
inside runs with float32 precision. The jax config context participates in
jit cache keys, so wrapped and unwrapped callers never share stale traces.
"""

from __future__ import annotations

import functools

import jax


def fp32_matmuls(fn):
    """Decorator: trace `fn` under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
