"""Roofline / MFU audit of the serving pipeline on the TPU chip.

For each pipeline stage at production shapes: FLOPs and HBM bytes from
XLA's own cost model (compiled.cost_analysis()), measured steady-state
time (dependent-scan method, see bench.py), the v5e roofline bound
t >= max(flops / peak_flops, bytes / peak_bw), and the resulting MFU /
bandwidth utilization. Prints a markdown table plus the speed-of-light
frames/s implied by the summed stage bounds, then sweeps the fused
pipeline batch 8 -> 64 for the throughput-serving optimum.

v5e peaks: 197 TFLOP/s bf16 (MXU), 819 GB/s HBM. MFU is reported against
the bf16 peak (the serving pipeline computes convs/GNN in bf16; the
fp32-pinned geometry stages understate their MFU by up to 4x by this
convention — noted inline).

Usage: python scripts/roofline_audit.py [--sweep]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

PEAK_FLOPS = 197e12  # bf16
PEAK_BW = 819e9  # HBM bytes/s

BATCH = 8
IMG = 512
N_KPTS = 1000
N3 = 2000
LEAF = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from onepose_tpu.geometry.ransac import ransac_pnp
    from onepose_tpu.models.superpoint import extract_keypoints
    from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    pipe = PosePipeline(max_keypoints=N_KPTS)
    sp, matcher = pipe.superpoint, pipe.matcher

    images = jnp.asarray(rng.random((BATCH, IMG, IMG, 1), np.float32))
    K = jnp.broadcast_to(
        jnp.asarray(
            [[600.0, 0, IMG / 2], [0, 600.0, IMG / 2], [0, 0, 1]],
            jnp.float32,
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

    # Stage inputs (realistic: produced once by the upstream stages).
    dense = jax.jit(sp.apply)(sp_params, images)
    feats = jax.jit(
        partial(extract_keypoints, max_keypoints=N_KPTS)
    )(dense["score_map"], dense["descriptor_map"])
    b = BATCH
    desc3d_b = jnp.broadcast_to(anno.desc3d[None], (b, N3, 256))
    leaves_b = jnp.broadcast_to(anno.leaf_desc[None], (b, N3, LEAF, 256))
    m3_b = jnp.broadcast_to(anno.mask3d[None], (b, N3))
    lm_b = jnp.broadcast_to(anno.leaf_mask[None], (b, N3, LEAF))
    match = jax.jit(matcher.apply)(
        m_params, feats["descriptors"], desc3d_b, leaves_b,
        feats["mask"], m3_b, lm_b,
    )
    idx = jnp.maximum(match["matches0"], 0)
    pts3d = jnp.take_along_axis(
        jnp.broadcast_to(anno.points3d[None], (b, N3, 3)), idx[..., None], 1
    )
    corr_mask = match["matches0"] >= 0
    keys = jax.random.split(key, b)

    stages = {
        "superpoint_dense": (
            lambda im: sp.apply(sp_params, im)["score_map"],
            (images,),
        ),
        "extract_keypoints": (
            lambda sm, dm: extract_keypoints(
                sm, dm, max_keypoints=N_KPTS
            )["keypoints"],
            (dense["score_map"], dense["descriptor_map"]),
        ),
        "gats_spg_matcher": (
            lambda d2, d3, lv: matcher.apply(
                m_params, d2, d3, lv, feats["mask"], m3_b, lm_b
            )["matches0"],
            (feats["descriptors"], desc3d_b, leaves_b),
        ),
        "ransac_pnp": (
            lambda kp, p3: jax.vmap(
                partial(
                    ransac_pnp,
                    n_hyp=pipe.ransac_hypotheses,
                    reproj_threshold=pipe.reproj_threshold,
                )
            )(keys, kp, p3, K, corr_mask)["pose"],
            (feats["keypoints"], pts3d),
        ),
        "fused_pipeline": (
            lambda im: pipe._forward(
                sp_params, m_params, im, K, anno, key
            )["pose"],
            (images,),
        ),
    }

    def cost_of(fn, args):
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0)
        )

    def time_stage(fn, args, iters=30):
        def perturb(args, eps):
            a0 = args[0]
            return (a0 + eps.astype(a0.dtype) * 1e-12,) + tuple(args[1:])

        @partial(jax.jit, static_argnames=("n",))
        def scanner(args, n):
            def body(eps, _):
                out = fn(*perturb(args, eps))
                return jnp.sum(out).astype(jnp.float32) * 1e-20, ()

            eps, _ = jax.lax.scan(
                body, jnp.asarray(0.0, jnp.float32), None, length=n
            )
            return eps

        null = jax.jit(lambda x: jnp.sum(x) * 0.0)
        float(scanner(args, iters))
        float(null(args[0]))
        ov = 0.0
        for _ in range(3):
            s = time.perf_counter()
            float(null(args[0]))
            ov += (time.perf_counter() - s) / 3
        t0 = time.perf_counter()
        float(scanner(args, iters))
        return (time.perf_counter() - t0 - ov) / iters

    print(f"batch={BATCH} img={IMG} n_kpts={N_KPTS} n3={N3} leaf={LEAF}")
    print(
        "| stage | GFLOP | MB | measured ms | bound ms | x-of-bound "
        "| MFU | BW util |"
    )
    print("|---|---|---|---|---|---|---|---|")
    bound_total = 0.0
    meas_total = 0.0
    for name, (fn, args) in stages.items():
        flops, bts = cost_of(fn, args)
        t = time_stage(fn, args)
        t_flops = flops / PEAK_FLOPS
        t_bw = bts / PEAK_BW
        bound = max(t_flops, t_bw)
        if name != "fused_pipeline":
            bound_total += bound
            meas_total += t
        print(
            f"| {name} | {flops / 1e9:.1f} | {bts / 1e6:.1f} "
            f"| {t * 1e3:.2f} | {bound * 1e3:.2f} | {t / bound:.1f}x "
            f"| {flops / t / PEAK_FLOPS * 100:.1f}% "
            f"| {bts / t / PEAK_BW * 100:.1f}% |"
        )
    print(
        f"stage-sum: measured {meas_total * 1e3:.2f} ms "
        f"({BATCH / meas_total:.0f} fps), roofline bound "
        f"{bound_total * 1e3:.2f} ms ({BATCH / bound_total:.0f} fps "
        f"speed-of-light)"
    )

    if "--sweep" in sys.argv:
        print("\nbatch sweep (fused pipeline):")
        print("| batch | ms/batch | frames/s | ms/frame |")
        print("|---|---|---|---|")
        for bsz in (8, 16, 32, 64):
            im = jnp.asarray(rng.random((bsz, IMG, IMG, 1), np.float32))
            Kb = jnp.broadcast_to(K[:1], (bsz, 3, 3))
            kb = key

            def fwd(im):
                return pipe._forward(
                    sp_params, m_params, im, Kb, anno, kb
                )["pose"]

            t = time_stage(fwd, (im,), iters=20)
            print(
                f"| {bsz} | {t * 1e3:.2f} | {bsz / t:.1f} "
                f"| {t * 1e3 / bsz:.3f} |"
            )


if __name__ == "__main__":
    main()
