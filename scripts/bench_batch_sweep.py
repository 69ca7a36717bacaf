"""End-to-end pipeline fps at different batch sizes (serving default:
PosePipeline bf16 GNN/conv compute, fp32 solver/ordering)."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.gats_spg import GATsSPG
from onepose_tpu.models.superpoint import SuperPoint
from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline

IMG, N_KPTS, N3, L = 512, 1000, 2000, 8
ITERS = 30

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
pipe = PosePipeline(max_keypoints=N_KPTS)  # serving default (bf16 compute)
sp = pipe.superpoint
matcher = pipe.matcher
anno = ObjectAnnotation(
    points3d=jnp.asarray(rng.normal(size=(N3, 3)) * 0.1, jnp.float32),
    desc3d=jnp.asarray(rng.normal(size=(N3, 256)), jnp.float32),
    leaf_desc=jnp.asarray(rng.normal(size=(N3, L, 256)), jnp.float32),
    mask3d=jnp.ones((N3,), bool),
    leaf_mask=jnp.ones((N3, L), bool),
)
sp_params = sp.init(key, jnp.zeros((1, IMG, IMG, 1)))
m_params = matcher.init(
    key, jnp.zeros((1, N_KPTS, 256)), anno.desc3d[None],
    anno.leaf_desc[None], jnp.ones((1, N_KPTS), bool), anno.mask3d[None],
    anno.leaf_mask[None],
)

for B in (8, 16, 32):
    images = jnp.asarray(rng.random((B, IMG, IMG, 1), np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[600.0, 0, 256], [0, 600.0, 256], [0, 0, 1]],
                    jnp.float32), (B, 3, 3))

    @jax.jit
    def run(imgs):
        def body(c, i):
            out = pipe._forward(
                sp_params, m_params, c, K, anno, jax.random.fold_in(key, i)
            )
            return c + 1e-12 * out["pose"][0, 0, 0], 0.0

        c, _ = jax.lax.scan(body, imgs, jnp.arange(ITERS))
        return jnp.sum(c * 0.0)

    float(run(images))
    t0 = time.perf_counter()
    float(run(images))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"batch {B}: {B / dt:8.1f} fps  ({dt * 1000:.1f} ms/iter)")
