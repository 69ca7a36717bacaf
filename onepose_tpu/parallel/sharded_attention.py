"""Sequence-parallel attention over a sharded point axis.

This is the project's context-parallelism analogue (SURVEY.md §2.3): the
matcher's 3D point axis (and its leaf axis) is sharded across chips, and
the 2D<->3D cross-attention plus the dual-softmax confidence become
collective operations over that axis. Two interchangeable strategies:

- psum form (linear attention): linear attention is a sum over source
  positions, so sharded keys/values reduce to psum'ing the [d, d] KV
  moment and the key-sum — O(d^2) bytes over ICI per head, independent of
  sequence length.
- ring form (softmax attention): keys/values circulate the ring via
  ppermute while each chip accumulates streaming-softmax statistics
  (running max / weighted sum), the standard ring-attention recipe.

The GSPMD path (jit + NamedSharding on the point axis, used by
__graft_entry__.dryrun_multichip) derives equivalent collectives
automatically; these explicit shard_map kernels exist for when the
schedule must be owned — e.g. overlapping the ring with compute — and as
the reference semantics for testing that path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from onepose_tpu.models.common import NEG_INF
from onepose_tpu.parallel.mesh import DATA_AXIS, POINTS_AXIS


def _phi(x):
    return jax.nn.elu(x) + 1.0


def _batch_spec(mesh, batch: int) -> object:
    """Shard the batch axis over the data axis when the mesh has one and
    the batch divides it — these kernels then compose with data
    parallelism (each data-parallel row runs its own points-axis
    collectives). Non-divisible batches (e.g. the b=1 init trace) stay
    replicated across the data axis."""
    if DATA_AXIS in mesh.axis_names and batch % mesh.shape[DATA_AXIS] == 0:
        return DATA_AXIS
    return None


def sharded_linear_attention(
    mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,
    v_length: int,
    eps: float = 1e-6,
    q_sharded: bool = False,
) -> jnp.ndarray:
    """Linear attention with keys/values sharded over the points axis.

    q: [B, N, H, D] replicated (or sharded on N when q_sharded — the
    3D-stream self-attention case where queries and keys are the SAME
    sharded point set); k, v: [B, M, H, D] sharded on M; kv_mask: [B, M];
    v_length: the GLOBAL M (for the reference's value conditioning).
    Returns [B, N, H, D] with the same layout as q.

    The collective cost is O(H * D^2) bytes (the KV moment + key sum),
    independent of sequence length — the linear-attention analogue of ring
    attention's bandwidth advantage.
    """

    def body(q, k, v, mask):
        phi_k = _phi(k) * mask.astype(k.dtype)[:, :, None, None]
        kv = jnp.einsum("bmhd,bmhe->bhde", phi_k, v / v_length)
        ksum = jnp.sum(phi_k, axis=1)
        kv = jax.lax.psum(kv, POINTS_AXIS)
        ksum = jax.lax.psum(ksum, POINTS_AXIS)
        phi_q = _phi(q)
        z = 1.0 / (jnp.einsum("bnhd,bhd->bnh", phi_q, ksum) + eps)
        return (
            jnp.einsum("bnhd,bhde,bnh->bnhe", phi_q, kv, z) * v_length
        )

    bs = _batch_spec(mesh, q.shape[0])
    q_spec = P(bs, POINTS_AXIS) if q_sharded else P(bs)
    kv_spec = P(bs, POINTS_AXIS)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, kv_spec),
        out_specs=q_spec,
        check_vma=False,
    )(q, k, v, kv_mask)


def ring_softmax_attention(
    mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,
    q_sharded: bool = False,
) -> jnp.ndarray:
    """Softmax attention with keys/values sharded on the points axis,
    computed by circulating KV blocks around the ring (ppermute) with
    streaming-softmax accumulation.

    q: [B, N, H, D] replicated (or sharded on N when q_sharded — each
    device then attends its local query rows against the circulating
    global KV stream); k/v: [B, M, H, D] sharded; kv_mask [B, M].
    """

    def body(q, k, v, mask):
        axis_size = jax.lax.axis_size(POINTS_AXIS)
        d = q.shape[-1]
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))

        def block_stats(k_blk, v_blk, m_blk):
            logits = (
                jnp.einsum("bnhd,bmhd->bhnm", q, k_blk) * scale
            )
            logits = jnp.where(
                m_blk[:, None, None, :], logits, NEG_INF
            )
            m_local = jnp.max(logits, axis=-1)  # [B, H, N]
            p = jnp.exp(logits - m_local[..., None])
            s_local = jnp.sum(p, axis=-1)
            o_local = jnp.einsum("bhnm,bmhd->bnhd", p, v_blk)
            return m_local, s_local, o_local

        def merge(acc, blk):
            m_a, s_a, o_a = acc
            m_b, s_b, o_b = blk
            m_new = jnp.maximum(m_a, m_b)
            ca = jnp.exp(m_a - m_new)
            cb = jnp.exp(m_b - m_new)
            s_new = s_a * ca + s_b * cb
            o_new = (
                o_a * ca.transpose(0, 2, 1)[..., None]
                + o_b * cb.transpose(0, 2, 1)[..., None]
            )
            return m_new, s_new, o_new

        perm = [
            (i, (i + 1) % axis_size) for i in range(axis_size)
        ]

        acc = block_stats(k, v, mask)
        kvm = (k, v, mask)

        def ring_step(i, state):
            acc, (k_c, v_c, m_c) = state
            k_c = jax.lax.ppermute(k_c, POINTS_AXIS, perm)
            v_c = jax.lax.ppermute(v_c, POINTS_AXIS, perm)
            m_c = jax.lax.ppermute(m_c, POINTS_AXIS, perm)
            acc = merge(acc, block_stats(k_c, v_c, m_c))
            return acc, (k_c, v_c, m_c)

        (m_f, s_f, o_f), _ = jax.lax.fori_loop(
            0, axis_size - 1, ring_step, (acc, kvm)
        )
        return o_f / jnp.maximum(
            s_f.transpose(0, 2, 1)[..., None], 1e-20
        )

    bs = _batch_spec(mesh, q.shape[0])
    q_spec = P(bs, POINTS_AXIS) if q_sharded else P(bs)
    kv_spec = P(bs, POINTS_AXIS)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, kv_spec),
        out_specs=q_spec,
        check_vma=False,
    )(q, k, v, kv_mask)


def sharded_dual_softmax(
    mesh,
    scores: jnp.ndarray,
    mask2d: jnp.ndarray,
    mask3d: jnp.ndarray,
) -> jnp.ndarray:
    """Dual-softmax confidence with the 3D axis sharded.

    scores: [B, N2, N3] sharded on N3; masks as usual. softmax over N2 is
    local; softmax over the sharded N3 needs a psum'd max and expsum.
    Returns the conf matrix, still sharded on N3.
    """

    def body(s, m2, m3):
        s = jnp.where(m2[:, :, None], s, NEG_INF)
        s = jnp.where(m3[:, None, :], s, NEG_INF)
        # Softmax over N2 (local axis).
        sm1 = jax.nn.softmax(s, axis=1)
        # Softmax over sharded N3: global max (pmax) + global expsum (psum).
        # The max shift is numerical stabilization only (softmax is
        # shift-invariant), so stop_gradient keeps the backward pass exact
        # while avoiding pmax's missing differentiation rule.
        mx = jax.lax.pmax(
            jnp.max(jax.lax.stop_gradient(s), axis=2, keepdims=True),
            POINTS_AXIS,
        )
        e = jnp.exp(s - mx)
        denom = jax.lax.psum(
            jnp.sum(e, axis=2, keepdims=True), POINTS_AXIS
        )
        sm2 = e / jnp.maximum(denom, 1e-20)
        return sm1 * sm2

    bs = _batch_spec(mesh, scores.shape[0])
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(bs, None, POINTS_AXIS), P(bs), P(bs, POINTS_AXIS)),
        out_specs=P(bs, None, POINTS_AXIS),
        check_vma=False,
    )(scores, mask2d, mask3d)
