"""Headline benchmark: end-to-end one-shot pose estimation frames/s.

Measures the full fused on-device pipeline at production shapes —
SuperPoint (512x512 crop, 1000 keypoint slots) -> GATsSPG matching against
a 2000-point / 8-leaf object annotation -> 512-hypothesis RANSAC EPnP +
Gauss-Newton refinement — batch 8, steady state, on whatever accelerator
JAX selects (the TPU chip under the driver).

Methodology for remote/tunneled TPU backends: the whole timed region is a
single jitted lax.scan over ITERS pipeline invocations with a data
dependency between iterations (the device cannot skip or overlap-away
steps), followed by one scalar host fetch that forces completion. Fixed
RPC overhead is measured with a null jitted fetch and subtracted. This
keeps the program count minimal (remote compiles are expensive) and the
measurement honest (enqueue-only timings undercount; per-iteration
fetches overcount by the tunnel round trip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline provenance: the reference (huanghaoran111/OnePose) publishes no
throughput numbers and its CUDA stack is not runnable here; the recorded
baseline is the reference torch pipeline (SuperPoint + GATsSPG forward at
identical shapes) measured on this host's CPU: 0.47 frames/s
(see BASELINE.md). vs_baseline = ours / 0.47.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

REFERENCE_FPS = 0.47  # reference torch pipeline, this host's CPU (BASELINE.md)

BATCH = 8
IMG = 512
N_KPTS = 1000
N_POINTS3D = 2000
NUM_LEAF = 8
ITERS = 50


def main() -> None:
    import jax
    import jax.numpy as jnp

    from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    pipe = PosePipeline(max_keypoints=N_KPTS)  # serving default (bf16 GNN)
    sp = pipe.superpoint
    matcher = pipe.matcher

    images = jnp.asarray(rng.random((BATCH, IMG, IMG, 1), np.float32))
    K = jnp.broadcast_to(
        jnp.asarray(
            [[600.0, 0, IMG / 2], [0, 600.0, IMG / 2], [0, 0, 1]],
            jnp.float32,
        ),
        (BATCH, 3, 3),
    )
    anno = ObjectAnnotation(
        points3d=jnp.asarray(
            rng.normal(size=(N_POINTS3D, 3)) * 0.1, jnp.float32
        ),
        desc3d=jnp.asarray(rng.normal(size=(N_POINTS3D, 256)), jnp.float32),
        leaf_desc=jnp.asarray(
            rng.normal(size=(N_POINTS3D, NUM_LEAF, 256)), jnp.float32
        ),
        mask3d=jnp.ones((N_POINTS3D,), bool),
        leaf_mask=jnp.ones((N_POINTS3D, NUM_LEAF), bool),
    )

    sp_params = sp.init(key, images[:1])
    m_params = matcher.init(
        key,
        jnp.zeros((1, N_KPTS, 256), jnp.float32),
        anno.desc3d[None],
        anno.leaf_desc[None],
        jnp.ones((1, N_KPTS), bool),
        anno.mask3d[None],
        anno.leaf_mask[None],
    )

    @partial(jax.jit, static_argnames=("n",))
    def bench_scan(sp_params, m_params, images, K, anno, key, n):
        def body(img, i):
            out = pipe._forward(
                sp_params, m_params, img, K, anno, jax.random.fold_in(key, i)
            )
            # Data dependency: next input is a function of this output.
            return (
                images + 1e-12 * out["pose"][0, 0, 0],
                out["pose"][0, 0, 0],
            )

        _, traces = jax.lax.scan(body, images, jnp.arange(n))
        return jnp.sum(traces)

    null_fetch = jax.jit(lambda x: jnp.sum(x) * 0.0)

    # Compile + warm both programs.
    float(bench_scan(sp_params, m_params, images, K, anno, key, ITERS))
    float(null_fetch(images))

    t0 = time.perf_counter()
    overhead = 0.0
    for _ in range(3):
        s = time.perf_counter()
        float(null_fetch(images))
        overhead += (time.perf_counter() - s) / 3

    t0 = time.perf_counter()
    float(bench_scan(sp_params, m_params, images, K, anno, key, ITERS))
    dt = time.perf_counter() - t0 - overhead

    fps = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "pose_pipeline_frames_per_s",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
