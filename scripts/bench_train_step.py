"""Bench the GATsSPG training step on chip at the reference recipe shapes.

Reference training (configs/experiment/train_GATsSPG.yaml:21-41): batch 8,
1000 2D x 2000 3D x 8 leaves, 4 GNN blocks, focal loss on the dense
[B, 1000, 2000] confidence matrix, Adam + clip. The timed region is a
jitted dependent scan over train steps (same methodology as bench.py:
one compile, one final fetch, tunnel RPC subtracted by construction).

Usage: python scripts/bench_train_step.py [batch] [steps]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.gats_spg import GATsSPG
from onepose_tpu.train.train_step import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
# fp32 is the reference training recipe; bf16 compute (fp32 params/optim)
# is the TPU-native option — pass 'bf16' to measure it.
DTYPE = jnp.bfloat16 if "bf16" in sys.argv[3:] else jnp.float32
N2, N3, L, C = 1000, 2000, 8, 256

rng = np.random.default_rng(0)
batch = {
    "desc2d": jnp.asarray(rng.normal(size=(B, N2, C)), jnp.float32),
    "desc3d": jnp.asarray(rng.normal(size=(B, N3, C)), jnp.float32),
    "leaf_desc": jnp.asarray(rng.normal(size=(B, N3, L, C)), jnp.float32),
    "mask2d": jnp.ones((B, N2), bool),
    "mask3d": jnp.ones((B, N3), bool),
    "leaf_mask": jnp.ones((B, N3, L), bool),
    "conf_gt": jnp.zeros((B, N2, N3), jnp.float32).at[:, 0, 0].set(1.0),
}

cfg = TrainConfig(steps_per_epoch=100)
model = GATsSPG(fused_match=False, dtype=DTYPE)
state = create_train_state(jax.random.PRNGKey(0), model, cfg, batch)
step = make_train_step(model, cfg)


@jax.jit
def run(state, batch):
    def body(s, _):
        s2, m = step(s, batch)
        return s2, m["loss"]

    s, losses = jax.lax.scan(body, state, None, length=STEPS)
    return losses[-1]


# Honest timing on the tunneled backend (see bench.py / BASELINE.md):
# block_until_ready can return at enqueue time, so force completion with
# a scalar HOST FETCH and subtract the fixed RPC cost of a null fetch.
null = jax.jit(lambda: jnp.zeros(()))
float(null())  # compile
t0 = time.perf_counter()
for _ in range(3):
    float(null())
rpc = (time.perf_counter() - t0) / 3

float(run(state, batch))  # compile + warm
batch2 = dict(batch, desc2d=batch["desc2d"] * 1.001)
t0 = time.perf_counter()
loss = float(run(state, batch2))
dt = (time.perf_counter() - t0) - rpc
ms = dt / STEPS * 1e3
print(
    f"train step: batch={B} n2={N2} n3={N3} L={L} blocks=4 "
    f"dtype={jnp.dtype(DTYPE).name}  "
    f"{ms:.2f} ms/step  ({B / (dt / STEPS):.1f} samples/s)  "
    f"loss={loss:.4f}  [rpc {rpc * 1e3:.0f} ms subtracted]"
)
