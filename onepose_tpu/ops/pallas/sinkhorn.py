"""VMEM-resident log-space Sinkhorn kernel.

The XLA path (onepose_tpu/models/superglue.py log_sinkhorn) streams the
[M+1, N+1] coupling matrix from HBM twice per iteration — 100 iterations
at SuperGlue shapes (1025 x 1025 fp32 ~ 4.2 MB) is ~840 MB of HBM traffic
per pair. This kernel pins the couplings in VMEM for the whole iteration
loop; only u/v potentials (a few KB) are written back.

Mirrors the reference semantics (src/models/matchers/SuperGlue/
superglue.py:181-210): alternating row/column log-normalization against
log-marginals, with masked slots carried as NEG_INF scores/marginals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onepose_tpu.ops.pallas import use_interpret_mode

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Per-core VMEM is ~16 MB; the kernel holds the padded couplings plus
# ~2 same-shape intermediates (C + v broadcast, its exp) live at once.
# 12 MB / (3 buffers * 4 B) ~= 1M elements — the SuperGlue default
# (1025 x 1025 -> 1032 x 1152 = 1.19M, ~14 MB total) is the measured
# upper edge that still fits; SfM's 4096-keypoint extraction budget
# (4104 x 4224 = 17.3M, ~208 MB) cannot be pinned. Above the budget the
# default is the XLA scan — measured on chip, XLA fuses both logsumexp
# updates into one HBM sweep per iteration, matching the row-blocked
# streaming kernel (ops/pallas/sinkhorn_stream.py), which therefore
# stays opt-in (docs/PERFORMANCE.md "The 4096-keypoint budget").
_VMEM_BUDGET_ELEMS = 1_300_000


def fits_vmem(m: int, n: int) -> bool:
    """True when the [m, n] coupling problem (padded to TPU tiles) fits
    the kernel's VMEM budget; callers fall back to the XLA scan path
    otherwise."""
    return _round_up(m, 8) * _round_up(n, 128) <= _VMEM_BUDGET_ELEMS


def _sinkhorn_kernel(c_ref, mu_ref, nu_ref, u_ref, v_ref, *, iters: int):
    """One example: c [M, N], mu [M, 1], nu [1, N] -> potentials u, v."""
    C = c_ref[:]
    mu = mu_ref[:]  # [M, 1]
    nu = nu_ref[:]  # [1, N]

    def body(_, uv):
        u, v = uv  # [M, 1], [1, N]
        t = C + v
        m = jnp.max(t, axis=1, keepdims=True)
        u = mu - (m + jnp.log(jnp.sum(jnp.exp(t - m), axis=1, keepdims=True)))
        t2 = C + u
        m2 = jnp.max(t2, axis=0, keepdims=True)
        v = nu - (
            m2 + jnp.log(jnp.sum(jnp.exp(t2 - m2), axis=0, keepdims=True))
        )
        return u, v

    u0 = jnp.zeros_like(mu)
    v0 = jnp.zeros_like(nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    u_ref[:] = u
    v_ref[:] = v


@partial(jax.jit, static_argnames=("iters",))
def sinkhorn_potentials(
    couplings: jnp.ndarray,
    log_mu: jnp.ndarray,
    log_nu: jnp.ndarray,
    iters: int = 100,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run `iters` Sinkhorn normalizations fully in VMEM.

    couplings: [B, M, N] log-scores (masked slots NEG_INF);
    log_mu: [B, M]; log_nu: [B, N]. Returns (u [B, M], v [B, N]) such that
    z = couplings + u[:, :, None] + v[:, None, :] is the log-assignment.
    """
    b, m, n = couplings.shape
    mp = _round_up(m, 8)
    np_ = _round_up(n, 128)
    # Pad with NEG_INF scores / marginals: padded slots carry no transport
    # mass and cannot affect real rows/columns (exp(-1e9 + x) == 0).
    cp = jnp.pad(
        couplings,
        ((0, 0), (0, mp - m), (0, np_ - n)),
        constant_values=NEG_INF,
    )
    mup = jnp.pad(log_mu, ((0, 0), (0, mp - m)), constant_values=NEG_INF)
    nup = jnp.pad(log_nu, ((0, 0), (0, np_ - n)), constant_values=NEG_INF)

    call = pl.pallas_call(
        partial(_sinkhorn_kernel, iters=iters),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), couplings.dtype),
            jax.ShapeDtypeStruct((1, np_), couplings.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=use_interpret_mode(),
    )

    u, v = jax.vmap(lambda c, muv, nuv: call(c, muv[:, None], nuv[None, :]))(
        cp, mup, nup
    )
    return u[:, :m, 0], v[:, 0, :n]
