"""Verify: drive the public onepose_tpu surface on the real chip + host.

Covers this change set: HDF5 feature/match caches round-tripping through the
mapping entry point's consumption shapes, new callbacks on a real model, and
the core pose path (ransac_pnp vs a known GT pose) on the TPU.
"""

import os
import sys
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

print("devices:", jax.devices())

# --- 1. Pose oracle on chip: synthetic 2D-3D matches with outliers.
from onepose_tpu.geometry.ransac import ransac_pnp
from onepose_tpu.geometry.metrics import query_pose_error

rng = np.random.default_rng(0)
N = 256
pts3d = rng.uniform(-0.1, 0.1, (N, 3)).astype(np.float32)
Rz = np.array(
    [[0.936, -0.352, 0.0], [0.352, 0.936, 0.0], [0.0, 0.0, 1.0]], np.float32
)
t_gt = np.array([0.02, -0.01, 0.45], np.float32)
K = np.array([[600.0, 0, 256], [0, 600.0, 256], [0, 0, 1]], np.float32)
p_cam = pts3d @ Rz.T + t_gt
uv = (p_cam @ K.T)[:, :2] / p_cam[:, 2:3]
uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
outl = rng.random(N) < 0.3
uv[outl] += rng.uniform(20, 80, (outl.sum(), 2)).astype(np.float32)
mask = np.ones(N, bool)

res = ransac_pnp(
    jax.random.PRNGKey(1), jnp.asarray(uv), jnp.asarray(pts3d),
    jnp.asarray(K), jnp.asarray(mask),
)
pose_gt = np.eye(4, dtype=np.float32)
pose_gt[:3, :3] = Rz
pose_gt[:3, 3] = t_gt
terr, rerr = query_pose_error(np.asarray(res["pose"]), pose_gt)
print(f"pnp: terr={float(terr):.3f}cm rerr={float(rerr):.3f}deg ok={res['ok']}")
assert res["ok"] and float(terr) < 1.0 and float(rerr) < 1.0

# Degenerate probe: all-masked input stays finite, ok=False.
res_bad = ransac_pnp(
    jax.random.PRNGKey(1), jnp.asarray(uv), jnp.asarray(pts3d),
    jnp.asarray(K), jnp.zeros(N, bool),
)
assert not bool(res_bad["ok"]) and np.isfinite(np.asarray(res_bad["pose"])).all()
print("degenerate probe: ok")

# --- 2. HDF5 cache round trip at package surface.
from onepose_tpu.sfm.cache import (
    CachedPairMatcher, load_features_h5, save_features_h5,
)

with tempfile.TemporaryDirectory() as td:
    F, Nk, C = 4, 32, 64
    feats = {
        "keypoints": rng.uniform(0, 512, (F, Nk, 2)).astype(np.float32),
        "descriptors": rng.normal(size=(F, Nk, C)).astype(np.float32),
        "scores": rng.uniform(size=(F, Nk)).astype(np.float32),
        "mask": rng.random((F, Nk)) < 0.8,
    }
    names = [f"{i}.png" for i in range(F)]
    p = os.path.join(td, "feats.h5")
    save_features_h5(p, names, feats["keypoints"], feats["descriptors"],
                     feats["scores"], feats["mask"], (512, 512))
    back = load_features_h5(p, names, pad_to=Nk)
    for i in range(F):
        m = feats["mask"][i]
        assert np.allclose(back["keypoints"][i][back["mask"][i]],
                           feats["keypoints"][i][m])
    calls = []

    def fake(pairs):
        calls.append(len(pairs))
        out = np.full((len(pairs), Nk), -1, np.int64)
        out[:, 0] = 1
        return out

    cm = CachedPairMatcher(fake, os.path.join(td, "m.h5"), names, Nk)
    pairs = np.array([[0, 1], [2, 3]])
    a = cm(pairs)
    b = cm(pairs)  # second call: fully cached
    assert calls == [2] and np.array_equal(a, b)
print("hdf5 caches: ok")

# --- 3. New callbacks on a real (small) matcher.
from onepose_tpu.models import GATsSPG
from onepose_tpu.train.callbacks import (
    ConfusionMatrixLogger, GradientWatch, log_hyperparameters,
)

model = GATsSPG(num_blocks=1, fused_match=False)
b, n2, n3, L, C = 1, 8, 12, 2, 256
batch = {
    "desc2d": jnp.asarray(rng.normal(size=(b, n2, C)), jnp.float32),
    "desc3d": jnp.asarray(rng.normal(size=(b, n3, C)), jnp.float32),
    "leaf_desc": jnp.asarray(rng.normal(size=(b, n3, L, C)), jnp.float32),
    "mask2d": jnp.ones((b, n2), bool),
    "mask3d": jnp.ones((b, n3), bool),
    "leaf_mask": jnp.ones((b, n3, L), bool),
    "conf_gt": jnp.zeros((b, n2, n3)).at[:, 0, 0].set(1.0),
}
params = model.init(jax.random.PRNGKey(0), batch["desc2d"], batch["desc3d"],
                    batch["leaf_desc"])


class S:
    pass


state = S()
state.params = params
with tempfile.TemporaryDirectory() as td:
    for cb in (ConfusionMatrixLogger(batch, model, run_dir=td),
               GradientWatch(batch, model, run_dir=td)):
        cb.on_train_start(td, {})
        rec = {}
        cb.on_epoch_end(0, rec, state)
    assert rec["grad_global_norm"] > 0
    hp = log_hyperparameters(td, {"lr": 1e-3}, state)
    assert hp["model/params_total"] > 100_000
print("callbacks on chip: ok")

# --- 4. Full pipeline smoke at production shapes on the chip.
from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline

pipe = PosePipeline(max_keypoints=512)
imgs = jnp.asarray(rng.random((2, 256, 256, 1), np.float32))
Kb = jnp.broadcast_to(jnp.asarray(K), (2, 3, 3))
anno = ObjectAnnotation(
    points3d=jnp.asarray(rng.normal(size=(500, 3)) * 0.1, jnp.float32),
    desc3d=jnp.asarray(rng.normal(size=(500, 256)), jnp.float32),
    leaf_desc=jnp.asarray(rng.normal(size=(500, 8, 256)), jnp.float32),
    mask3d=jnp.ones((500,), bool),
    leaf_mask=jnp.ones((500, 8), bool),
)
spp = pipe.superpoint.init(jax.random.PRNGKey(0), imgs[:1])
mp = pipe.matcher.init(
    jax.random.PRNGKey(0), jnp.zeros((1, 512, 256)), anno.desc3d[None],
    anno.leaf_desc[None], jnp.ones((1, 512), bool), anno.mask3d[None],
    anno.leaf_mask[None],
)
out = pipe(spp, mp, imgs, Kb, anno)
assert out["pose"].shape == (2, 4, 4)
assert np.isfinite(np.asarray(out["pose"])).all()
print("pipeline smoke: ok")
print("ALL VERIFY CHECKS PASSED")
