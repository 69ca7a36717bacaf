"""A/B bench: mixed-precision attention internals vs pinned-fp32.

The serving default (PosePipeline compute_dtype=bfloat16) upcasts q/k/v to
fp32 before the attention einsums (common.py MultiHeadAttention), so the
matcher's biggest contractions run fp32 on the MXU over bf16-rounded data.
`mixed_attention=True` keeps those operands bf16 with fp32 accumulation
(preferred_element_type) — the MXU's native mode — while the elu+1 feature
map and the linear-attention normalizer stay fp32.

Measures the FULL fused pipeline (bench.py shapes + methodology) both
ways, plus match agreement and pose delta between the two programs on
identical inputs. Decision rule (kernel policy): flip the serving default
only if end-to-end fps improves AND matches agree >99.9%.
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.gats_spg import GATsSPG
from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline

BATCH, IMG, N2, N3, LEAF = 8, 512, 1000, 2000, 8
ITERS = 30

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

images = jnp.asarray(rng.random((BATCH, IMG, IMG, 1), np.float32))
K = jnp.broadcast_to(
    jnp.asarray(
        [[600.0, 0, IMG / 2], [0, 600.0, IMG / 2], [0, 0, 1]], jnp.float32
    ),
    (BATCH, 3, 3),
)
anno = ObjectAnnotation(
    points3d=jnp.asarray(rng.normal(size=(N3, 3)) * 0.1, jnp.float32),
    desc3d=jnp.asarray(rng.normal(size=(N3, 256)), jnp.float32),
    leaf_desc=jnp.asarray(rng.normal(size=(N3, LEAF, 256)), jnp.float32),
    mask3d=jnp.ones((N3,), bool),
    leaf_mask=jnp.ones((N3, LEAF), bool),
)

null_fetch = jax.jit(lambda x: jnp.sum(x) * 0.0)
float(null_fetch(images))
t0 = time.perf_counter()
for _ in range(3):
    float(null_fetch(images))
RPC = (time.perf_counter() - t0) / 3

results = {}
for mixed in (False, True):
    pipe = PosePipeline(
        matcher=GATsSPG(dtype=jnp.bfloat16, mixed_attention=mixed),
        max_keypoints=N2,
    )
    if "sp_params" not in results:
        results["sp_params"] = pipe.superpoint.init(key, images[:1])
        results["m_params"] = pipe.matcher.init(
            key,
            jnp.zeros((1, N2, 256), jnp.float32),
            anno.desc3d[None],
            anno.leaf_desc[None],
            jnp.ones((1, N2), bool),
            anno.mask3d[None],
            anno.leaf_mask[None],
        )
    sp_params, m_params = results["sp_params"], results["m_params"]

    @partial(jax.jit, static_argnames=("n",))
    def bench_scan(sp_params, m_params, images, K, anno, key, n, pipe=pipe):
        def body(img, i):
            out = pipe._forward(
                sp_params, m_params, img, K, anno, jax.random.fold_in(key, i)
            )
            return (
                images + 1e-12 * out["pose"][0, 0, 0],
                out["pose"][0, 0, 0],
            )

        _, traces = jax.lax.scan(body, images, jnp.arange(n))
        return jnp.sum(traces)

    float(bench_scan(sp_params, m_params, images, K, anno, key, ITERS))
    t0 = time.perf_counter()
    float(bench_scan(sp_params, m_params, images, K, anno, key, ITERS))
    dt = time.perf_counter() - t0 - RPC
    fps = BATCH * ITERS / dt
    out = jax.jit(pipe._forward)(sp_params, m_params, images, K, anno, key)
    results[mixed] = (fps, jax.device_get(out))
    print(f"mixed={mixed}:  {fps:7.1f} fps  "
          f"({dt / ITERS * 1e3:.2f} ms/batch-{BATCH})")

f0, o0 = results[False]
f1, o1 = results[True]
agree = (o0["matches0"] == o1["matches0"]).mean()
dpose = np.abs(o0["pose"] - o1["pose"]).max()
print(f"speedup {f1 / f0:.3f}x   match agreement {agree:.5f}   "
      f"max pose delta {dpose:.2e}")
