"""Worker entry for REAL multi-process (multi-host simulation) tests.

Launched by tests/test_multiprocess.py as N separate OS processes, each a
separate JAX process joined through jax.distributed over a local TCP
coordinator with the CPU backend — the same topology a TPU pod slice uses
over DCN, minus the hardware. This is the execution proof for the
framework's multi-host story (SURVEY.md §4: "multi-host tests using JAX's
multi-process simulation on CPU"); the reference's equivalent is torch
DDP ranks + comm.gather (src/utils/comm.py:141-215).

Usage: python tests/mp_worker.py <task> --pid I --nproc N --port P \
           --workdir DIR [--data JSON]
Each rank writes `<task>_rank<I>.json` into workdir; assertion failures
exit nonzero so the parent test fails loudly.
"""

import argparse
import json
import os
import os.path as osp
import sys


def _init_jax(args):
    """Join the process group BEFORE importing anything that touches
    devices. Exercises utils.comm.init_distributed's env-var path."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    # One local device per process: the cleanest multi-host analogue.
    os.environ.pop("XLA_FLAGS", None)
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{args.port}"
    os.environ["JAX_NUM_PROCESSES"] = str(args.nproc)
    os.environ["JAX_PROCESS_ID"] = str(args.pid)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from onepose_tpu.utils.comm import init_distributed

    init_distributed()
    assert jax.process_count() == args.nproc, jax.process_count()
    assert jax.process_index() == args.pid
    return jax


def _write(args, task, payload):
    path = osp.join(args.workdir, f"{task}_rank{args.pid}.json")
    with open(path, "w") as f:
        json.dump(payload, f)


def task_comm(args, jax):
    """init_distributed + every utils.comm primitive under a real
    process_count=2 group."""
    import numpy as np

    from onepose_tpu.utils import comm

    assert comm.get_world_size() == args.nproc
    assert comm.get_rank() == args.pid
    assert comm.is_main_process() == (args.pid == 0)

    tree = {
        "rank": np.int32(args.pid),
        "arr": np.arange(4, dtype=np.float32) + 10.0 * args.pid,
        "nested": {"b": np.full((2, 2), float(args.pid + 1), np.float32)},
    }
    gathered = comm.all_gather_pytree(tree)
    assert len(gathered) == args.nproc
    for r, g in enumerate(gathered):
        np.testing.assert_array_equal(np.asarray(g["rank"]), r)
        np.testing.assert_allclose(
            np.asarray(g["arr"]), np.arange(4, dtype=np.float32) + 10.0 * r
        )
        np.testing.assert_allclose(np.asarray(g["nested"]["b"]), r + 1.0)

    avg = comm.reduce_dict({"x": float(args.pid + 1), "y": 2.0})
    tot = comm.reduce_dict({"x": float(args.pid + 1)}, average=False)
    comm.synchronize()
    _write(
        args,
        "comm",
        {
            "world": comm.get_world_size(),
            "rank": comm.get_rank(),
            "avg_x": avg["x"],
            "avg_y": avg["y"],
            "sum_x": tot["x"],
        },
    )


def _val_items(n_items=6, n2=24, n3=32, L=2, C=32, seed=3):
    """Deterministic synthetic 2D-3D val items with planted structure:
    the first n2 3D points project to the 2D keypoints and share
    descriptors (plus noise), so the matcher/PnP path has real signal.
    Identical on every rank (seeded) — sharding must not change metrics."""
    import numpy as np

    rng = np.random.default_rng(seed)
    items = []
    for _ in range(n_items):
        pts3d = (rng.random((n3, 3)) - 0.5).astype(np.float32) * 0.2
        d3 = rng.normal(size=(n3, C)).astype(np.float32)
        d2 = d3[:n2] + 0.05 * rng.normal(size=(n2, C)).astype(np.float32)
        leaf = (
            d3[:, None, :]
            + 0.05 * rng.normal(size=(n3, L, C)).astype(np.float32)
        )
        # Camera on a ring looking at the origin.
        ang = rng.random() * 2 * np.pi
        center = np.array([np.cos(ang), np.sin(ang), 0.6]) * 0.5
        z = -center / np.linalg.norm(center)
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z]).astype(np.float32)
        t = (-R @ center).astype(np.float32)
        K = np.array(
            [[320.0, 0, 128.0], [0, 320.0, 128.0], [0, 0, 1]], np.float32
        )
        pc = pts3d[:n2] @ R.T + t
        uv = pc @ K.T
        kpts2d = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R
        pose[:3, 3] = t
        items.append(
            {
                "desc2d": d2 / np.linalg.norm(d2, axis=-1, keepdims=True),
                "desc3d": d3 / np.linalg.norm(d3, axis=-1, keepdims=True),
                "leaf_desc": leaf
                / np.linalg.norm(leaf, axis=-1, keepdims=True),
                "mask2d": np.ones(n2, bool),
                "mask3d": np.ones(n3, bool),
                "leaf_mask": np.ones((n3, L), bool),
                "kpts2d": kpts2d,
                "points3d": pts3d,
                "pose_gt": pose,
                "K": K,
            }
        )
    return items


def task_val(args, jax):
    """Distributed pose validation: each rank evaluates a strided shard,
    counts are summed across processes, and (on rank 0) the aggregated
    metrics must EXACTLY match a plain single-process pass over the full
    val set — the reference's DDP val-metric gather semantics
    (GATsSPG_lightning_model.py:85-115)."""
    from types import SimpleNamespace

    from onepose_tpu.models.gats_spg import GATsSPG
    from onepose_tpu.train.loop import make_pose_val_fn

    items = _val_items()
    model = GATsSPG(d_model=32, num_blocks=1, fused_match=False)
    it = items[0]
    params = model.init(
        jax.random.PRNGKey(0),
        it["desc2d"][None],
        it["desc3d"][None],
        it["leaf_desc"][None],
        it["mask2d"][None],
        it["mask3d"][None],
        it["leaf_mask"][None],
    )
    state = SimpleNamespace(params=params)

    dist_metrics = make_pose_val_fn(items, model, n_hyp=64)(state)
    payload = {"dist": dist_metrics}
    if args.pid == 0:
        dense_metrics = make_pose_val_fn(
            items, model, n_hyp=64, distributed=False
        )(state)
        payload["dense"] = dense_metrics
        for k, v in dense_metrics.items():
            assert abs(dist_metrics[k] - v) < 1e-9, (k, dist_metrics[k], v)
    _write(args, "val", payload)


def task_map(args, jax):
    """Process-sharded map roster (cli/map_object.py:123-124): two ranks,
    two objects — each rank must build exactly its strided share, with
    artifacts landing in the shared out_dir."""
    from onepose_tpu.cli.map_object import DEFAULTS, run
    from onepose_tpu.config import load_config

    data = json.loads(args.data)
    cfg = load_config(
        DEFAULTS,
        None,
        [
            "data_dir=" + ",".join(data["seq_dirs"]),
            "out_dir=" + data["out_dir"],
            "max_keypoints=128",
            "num_covis=3",
            "max_points3d=200",
        ],
    )
    summary = run(cfg)
    _write(
        args,
        "map",
        {
            "objects": sorted(summary["objects"]),
            "num_objects": summary["num_objects"],
            "points": {
                k: v.get("num_points3d", 0)
                for k, v in summary["objects"].items()
            },
        },
    )


TASKS = {"comm": task_comm, "val": task_val, "map": task_map}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=sorted(TASKS))
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--data", default="{}")
    args = p.parse_args()
    jax = _init_jax(args)
    TASKS[args.task](args, jax)


if __name__ == "__main__":
    sys.exit(main())
