"""End-to-end CLI wall-time bench on the chip (VERDICT r3 item 6):

1. full `map` command on a synthetic textured orbit sequence — per-stage
   wall seconds from the new stage_s stats field;
2. `demo` command with tracking enabled — per-frame per-stage ms from the
   StageTimer (reference emits these per frame,
   src/tracker/tracking_utils.py:5-46).

Synthetic data: textured-blob orbit frames rendered on the host (each 3D
point carries a distinct anisotropic-Gaussian texture so descriptors are
discriminative), written in the OnePose directory schema.

Usage: python scripts/bench_cli_e2e.py [n_frames] [img]
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(
    0, osp.dirname(osp.dirname(osp.abspath(__file__)))
)

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 60
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def build_sequence(root: str, n_frames: int, img: int, n_pts: int = 120):
    import cv2

    rng = np.random.default_rng(0)
    obj = osp.join(root, "obj")
    seq = osp.join(obj, "seq")
    for sub in ("color", "color_full", "poses_ba", "intrin_ba"):
        os.makedirs(osp.join(seq, sub))
    scale = 0.2
    pts3d = ((rng.random((n_pts, 3)) - 0.5) * scale).astype(np.float32)
    f_len = img * 1.5
    K = np.array(
        [[f_len, 0, img / 2], [0, f_len, img / 2], [0, 0, 1]], np.float32
    )
    half = scale * 0.75
    np.savetxt(
        osp.join(obj, "box3d_corners.txt"),
        np.array(
            [[x, y, z] for y in (half, -half) for x, z in
             [(-half, -half), (-half, half), (half, half), (half, -half)]]
        ),
    )
    with open(osp.join(seq, "intrinsics.txt"), "w") as fh:
        fh.write(
            f"fx: {K[0,0]}\nfy: {K[1,1]}\ncx: {K[0,2]}\ncy: {K[1,2]}"
        )
    n_lobes = 4
    amp = rng.uniform(0.4, 1.0, (n_pts, n_lobes)) * rng.choice(
        [-1.0, 1.0], (n_pts, n_lobes)
    )
    offs = rng.uniform(-4.0, 4.0, (n_pts, n_lobes, 2))
    sig = rng.uniform(1.5, 5.0, (n_pts, n_lobes))
    ys, xs = np.mgrid[0:img, 0:img]
    for f in range(n_frames):
        ang = 0.5 * f / n_frames * 2 * np.pi
        center = np.array([np.cos(ang) * 0.5, np.sin(ang) * 0.5, 0.3])
        z = -center / np.linalg.norm(center)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ center
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = t
        pc = pts3d @ R.T + t
        uvw = pc @ K.T
        uv = uvw[:, :2] / uvw[:, 2:3]
        image = np.full((img, img), 0.5, np.float32)
        for p_i in range(n_pts):
            u, v = uv[p_i]
            if not (8 < u < img - 8 and 8 < v < img - 8):
                continue
            for l_i in range(n_lobes):
                du = xs - (u + offs[p_i, l_i, 0])
                dv = ys - (v + offs[p_i, l_i, 1])
                r2 = du * du + dv * dv
                m = r2 < (4 * sig[p_i, l_i]) ** 2
                image[m] += amp[p_i, l_i] * np.exp(
                    -r2[m] / (2 * sig[p_i, l_i] ** 2)
                )
        png = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(osp.join(seq, "color", f"{f}.png"), png)
        cv2.imwrite(osp.join(seq, "color_full", f"{f}.png"), png)
        np.savetxt(osp.join(seq, "poses_ba", f"{f}.txt"), pose)
        np.savetxt(osp.join(seq, "intrin_ba", f"{f}.txt"), K)
    return seq


def main():
    from onepose_tpu.__main__ import main as cli_main

    tmp = tempfile.mkdtemp(prefix="bench_cli_")
    print(f"building {N_FRAMES}-frame {IMG}x{IMG} sequence...", flush=True)
    seq = build_sequence(tmp, N_FRAMES, IMG)
    out_dir = osp.join(osp.dirname(seq), "outputs")

    t0 = time.perf_counter()
    rc = cli_main(
        [
            "map", f"data_dir={seq}", f"out_dir={out_dir}",
            "max_keypoints=1024", "num_covis=8", "max_points3d=2000",
            "anno_format=npz",
        ]
    )
    map_s = time.perf_counter() - t0
    assert rc == 0
    stats = json.load(open(osp.join(out_dir, "stats.json")))
    print(
        f"\nmap: {map_s:.1f} s wall for {N_FRAMES} frames "
        f"({stats['num_points3d']} points, "
        f"reproj {stats.get('mean_reproj_error_px', -1):.2f} px)"
    )
    print("map stage_s:", json.dumps(stats.get("stage_s", {})))

    demo_out = osp.join(tmp, "demo_out")
    t0 = time.perf_counter()
    rc = cli_main(
        [
            "demo", f"data_dir={seq}",
            f"anno_dir={osp.join(out_dir, 'anno')}",
            f"out_dir={demo_out}",
            # Weight-free oracle matcher: poses solve, so box tracking /
            # flow tracking / windowed BA actually engage (with random
            # GATsSPG weights every frame would fall back to re-detect).
            "matcher=nn",
            "use_tracking=true", "make_video=false",
        ]
    )
    demo_s = time.perf_counter() - t0
    assert rc == 0
    summary = json.load(open(osp.join(demo_out, "results.json")))[
        "summary"
    ]
    print(
        f"\ndemo(track): {demo_s:.1f} s wall, "
        f"{summary['num_frames']} frames "
        f"({1e3 * demo_s / summary['num_frames']:.0f} ms/frame incl. "
        "host IO)"
    )
    print("demo stage_ms (mean):", json.dumps(summary["stage_ms"]))
    print(
        "demo stage_ms (p50, excl. compiles):",
        json.dumps(summary.get("stage_p50_ms", {})),
    )
    print(
        "counts:",
        {
            k: summary[k]
            for k in ("n_detect", "n_box_track", "n_matcher", "n_flow_track")
        },
    )


if __name__ == "__main__":
    main()
