"""Bench the batched SfM pair matcher vs the serial per-pair loop on chip.

The reference matches covisibility pairs one at a time
(src/sfm/match_features.py:45-85). parallel/sfm_parallel.py stacks pairs
into fixed chunks; this script measures the resulting map-front-end
throughput for both matchers at the demo keypoint budget.

Usage: python scripts/bench_pair_batching.py [n_kpts] [n_pairs]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models import SuperGlue
from onepose_tpu.models.nn_matcher import mutual_nn_match
from onepose_tpu.parallel.sfm_parallel import (
    make_nn_pair_matcher,
    make_superglue_pair_matcher,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
P = int(sys.argv[2]) if len(sys.argv) > 2 else 64
F, C = 16, 256  # frames, descriptor dim
HW = (512, 512)

rng = np.random.default_rng(0)
desc = rng.normal(size=(F, N, C)).astype(np.float32)
desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
mask = np.ones((F, N), bool)
feats = {
    "keypoints": rng.uniform(0, 511, size=(F, N, 2)).astype(np.float32),
    "descriptors": desc,
    "scores": rng.random((F, N)).astype(np.float32),
    "mask": mask,
    "image_hw": HW,
}
pairs = np.asarray([(i % F, (i + 1 + i // F) % F) for i in range(P)])


def timed(label, fn):
    fn(pairs[:8])  # compile
    t0 = time.perf_counter()
    out = fn(pairs)
    dt = time.perf_counter() - t0
    print(f"{label:34s} {dt * 1e3 / P:8.2f} ms/pair ({P / dt:7.1f} pairs/s)")
    return out


# --- mutual-NN matcher ---
def nn_serial(ps):
    return np.stack(
        [
            np.asarray(
                mutual_nn_match(
                    jnp.asarray(desc[i]), jnp.asarray(desc[j]),
                    jnp.asarray(mask[i]), jnp.asarray(mask[j]),
                    distance_thresh=0.7,
                )["matches0"]
            )
            for i, j in ps
        ]
    )


a = timed("NN serial (per-pair dispatch)", nn_serial)
for chunk in (8, 16, 32):
    b = timed(
        f"NN batched chunk={chunk}",
        make_nn_pair_matcher(desc, mask, 0.7, pair_chunk=chunk),
    )
    assert (a == b).all()

# --- SuperGlue matcher ---
sg = SuperGlue()
params = sg.init(
    jax.random.PRNGKey(0),
    jnp.zeros((1, N, 2)), jnp.zeros((1, N, 2)),
    jnp.zeros((1, N, C)), jnp.zeros((1, N, C)),
    jnp.zeros((1, N)), jnp.zeros((1, N)),
    HW, HW,
)
apply_one = jax.jit(
    lambda k0, k1, d0, d1, s0, s1, m0, m1: sg.apply(
        params, k0, k1, d0, d1, s0, s1, HW, HW, m0, m1
    )["matches0"]
)


def sg_serial(ps):
    return np.stack(
        [
            np.asarray(
                apply_one(
                    jnp.asarray(feats["keypoints"][i])[None],
                    jnp.asarray(feats["keypoints"][j])[None],
                    jnp.asarray(desc[i])[None], jnp.asarray(desc[j])[None],
                    jnp.asarray(feats["scores"][i])[None],
                    jnp.asarray(feats["scores"][j])[None],
                    jnp.asarray(mask[i])[None], jnp.asarray(mask[j])[None],
                )[0]
            )
            for i, j in ps
        ]
    )


a = timed("SuperGlue serial (per-pair)", sg_serial)
for chunk in ((2, 4) if N >= 4096 else (4, 8)):
    b = timed(
        f"SuperGlue batched chunk={chunk}",
        make_superglue_pair_matcher(sg, params, feats, pair_chunk=chunk),
    )
    assert (a == b).all()
