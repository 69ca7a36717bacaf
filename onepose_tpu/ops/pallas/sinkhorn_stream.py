"""Row-blocked HBM-streaming log-space Sinkhorn kernel.

For coupling matrices too large to pin in VMEM (the VMEM kernel in
ops/pallas/sinkhorn.py caps at ~1.3M elements; the reference's SfM budget
of 4096 keypoints — src/sfm/extract_features.py:8-26 — yields a
[4097, 4097] fp32 coupling, ~67 MB). The XLA scan fallback reads the full
coupling TWICE per iteration (row logsumexp + column logsumexp); at 100
iterations that is ~13.4 GB of HBM traffic per pair and ~50 ms/pair
measured on v5e (docs/PERFORMANCE.md).

This kernel halves the traffic structurally and (optionally) halves it
again with a bf16-stored coupling:

- ONE sweep over the coupling per iteration: for each row block, the row
  update u_blk = mu - lse_cols(C_blk + v_prev) is computed AND the block's
  contribution to the column logsumexp of (C_blk + u_blk) is folded into a
  VMEM-resident online (max, scaled-sum) accumulator. When the sweep
  completes, v_new = nu - (m_acc + log(s_acc)). The update order (u from
  v_prev, v from the fresh u) is exactly the scan's, so results agree to
  fp32 reduction-reorder tolerance.
- The coupling streams through VMEM in (block_rows, N) tiles via the grid
  pipeline (auto double-buffered); u/v/accumulators live in VMEM.
- With coupling_dtype=bfloat16 the streamed bytes halve again; all
  arithmetic (adds, exp, log, max) stays fp32 — only the stored coupling
  is quantized (~3 decimal digits, an additive ~4e-3 perturbation of the
  log-scores at SuperGlue scale).

Masked slots carry NEG_INF scores/marginals exactly as the VMEM kernel.
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


def _stream_kernel(
    c_ref, mu_ref, nu_ref, u_ref, v_ref,
    v_s, m_acc, s_acc,
    *, iters: int, n_blocks: int,
):
    """Grid (iters, n_blocks); c block [R, Np], mu block [R, 1],
    nu [1, Np]; outputs u [R, 1] per block, v [1, Np] at the end.
    Scratch: v_s [1, Np] (current potentials), m_acc/s_acc [1, Np]
    (online column logsumexp of C + u for the running iteration)."""
    it = pl.program_id(0)
    rb = pl.program_id(1)

    @pl.when((it == 0) & (rb == 0))
    def _init():
        v_s[:] = jnp.zeros_like(v_s)

    @pl.when((it > 0) & (rb == 0))
    def _finalize_prev():
        # Complete the previous iteration's column normalization.
        v_s[:] = nu_ref[:] - (m_acc[:] + jnp.log(s_acc[:]))

    @pl.when(rb == 0)
    def _reset_acc():
        m_acc[:] = jnp.full_like(m_acc, NEG_INF)
        s_acc[:] = jnp.zeros_like(s_acc)

    C = c_ref[:].astype(jnp.float32)  # [R, Np]
    v = v_s[:]  # [1, Np]

    # Row update for this block (uses v from the previous iteration).
    t = C + v
    m = jnp.max(t, axis=1, keepdims=True)  # [R, 1]
    u_blk = mu_ref[:] - (
        m + jnp.log(jnp.sum(jnp.exp(t - m), axis=1, keepdims=True))
    )
    u_ref[:] = u_blk

    # Fold this block into the column logsumexp accumulator (online).
    t2 = C + u_blk
    m2 = jnp.max(t2, axis=0, keepdims=True)  # [1, Np]
    s2 = jnp.sum(jnp.exp(t2 - m2), axis=0, keepdims=True)
    m_new = jnp.maximum(m_acc[:], m2)
    # Both exponents are <= 0 by construction of m_new: no overflow.
    s_acc[:] = s_acc[:] * jnp.exp(m_acc[:] - m_new) + s2 * jnp.exp(
        m2 - m_new
    )
    m_acc[:] = m_new

    @pl.when((it == iters - 1) & (rb == n_blocks - 1))
    def _finalize_last():
        v_ref[:] = nu_ref[:] - (m_acc[:] + jnp.log(s_acc[:]))


@partial(
    jax.jit, static_argnames=("iters", "block_rows", "coupling_dtype")
)
def sinkhorn_potentials_streamed(
    couplings: jnp.ndarray,
    log_mu: jnp.ndarray,
    log_nu: jnp.ndarray,
    iters: int = 100,
    block_rows: int = 128,
    coupling_dtype: jnp.dtype | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming Sinkhorn for large problems.

    couplings: [B, M, N] log-scores (masked slots NEG_INF);
    log_mu: [B, M]; log_nu: [B, N]. Returns (u [B, M], v [B, N]) such that
    z = couplings + u[:, :, None] + v[:, None, :] is the log-assignment —
    the same contract as ops.pallas.sinkhorn.sinkhorn_potentials.

    coupling_dtype: storage dtype of the streamed coupling (None keeps the
    input dtype; jnp.bfloat16 halves HBM traffic, arithmetic stays fp32).
    """
    b, m, n = couplings.shape
    R = block_rows
    mp = _round_up(m, R)
    np_ = _round_up(n, 128)
    n_blocks = mp // R

    store_dtype = coupling_dtype or couplings.dtype
    cp = jnp.pad(
        couplings.astype(jnp.float32),
        ((0, 0), (0, mp - m), (0, np_ - n)),
        constant_values=NEG_INF,
    ).astype(store_dtype)
    mup = jnp.pad(
        log_mu.astype(jnp.float32), ((0, 0), (0, mp - m)),
        constant_values=NEG_INF,
    )
    nup = jnp.pad(
        log_nu.astype(jnp.float32), ((0, 0), (0, np_ - n)),
        constant_values=NEG_INF,
    )

    call = pl.pallas_call(
        partial(_stream_kernel, iters=iters, n_blocks=n_blocks),
        grid=(iters, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (R, np_), lambda it, rb: (rb, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (R, 1), lambda it, rb: (rb, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, np_), lambda it, rb: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (R, 1), lambda it, rb: (rb, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, np_), lambda it, rb: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, np_), jnp.float32),  # v (current)
            pltpu.VMEM((1, np_), jnp.float32),  # m_acc
            pltpu.VMEM((1, np_), jnp.float32),  # s_acc
        ],
        interpret=use_interpret_mode(),
    )

    u, v = jax.vmap(
        lambda c, muv, nuv: call(c, muv[:, None], nuv[None, :])
    )(cp, mup, nup)
    return u[:, :m, 0], v[:, 0, :n]
