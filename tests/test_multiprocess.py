"""REAL multi-process (multi-host simulation) tests.

Each test launches tests/mp_worker.py as 2 separate OS processes joined
via jax.distributed over a local TCP coordinator (CPU backend, 1 local
device per process — the DCN topology of a 2-host pod minus the
hardware). This executes the multi-host code paths for real:
utils.comm collectives, the process-sharded map roster
(cli/map_object.py), and cross-process val-metric aggregation
(train/loop.make_pose_val_fn).

Reference parity targets: torch.distributed gather helpers
(src/utils/comm.py:141-258) consumed by the DDP validation epoch
(src/models/GATsSPG_lightning_model.py:99-103). SURVEY.md §4 prescribes
exactly this CPU multi-process simulation strategy.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = osp.join(osp.dirname(__file__), "mp_worker.py")
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(task: str, workdir: str, nproc: int = 2, data: dict = None,
            timeout: int = 900, local_devices: int = 1):
    """Spawn nproc workers, wait for all, fail loudly with their output."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pick their own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(nproc):
        cmd = [
            sys.executable, WORKER, task,
            "--pid", str(pid), "--nproc", str(nproc),
            "--port", str(port), "--workdir", workdir,
            "--local-devices", str(local_devices),
        ]
        if data is not None:
            cmd += ["--data", json.dumps(data)]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\n--- output ---\n{out[-4000:]}"
        )
    return [
        json.load(open(osp.join(workdir, f"{task}_rank{pid}.json")))
        for pid in range(nproc)
    ]


@pytest.mark.slow
def test_comm_collectives_two_processes(tmp_path):
    """init_distributed + all_gather_pytree + reduce_dict + synchronize
    under a real process_count=2 group (the workers assert the gathered
    contents rank-by-rank; the parent checks the reductions)."""
    results = _launch("comm", str(tmp_path))
    for rank, r in enumerate(results):
        assert r["world"] == 2
        assert r["rank"] == rank
        # mean of {1, 2} and sum of {1, 2}, identical on every rank
        assert r["avg_x"] == pytest.approx(1.5)
        assert r["avg_y"] == pytest.approx(2.0)
        assert r["sum_x"] == pytest.approx(3.0)


@pytest.mark.slow
def test_val_metric_aggregation_matches_single_process(tmp_path):
    """Sharded validation (each rank evaluates half the val set, counts
    summed across processes) returns the EXACT single-process metrics on
    every rank — reference DDP val gather semantics."""
    results = _launch("val", str(tmp_path))
    r0, r1 = results
    # Both ranks report identical aggregated metrics.
    for k in r0["dist"]:
        assert r0["dist"][k] == pytest.approx(r1["dist"][k], abs=1e-9), k
    # Rank 0 verified dist == dense in-process; re-check here.
    for k, v in r0["dense"].items():
        assert r0["dist"][k] == pytest.approx(v, abs=1e-9), k
    assert r0["dist"]["val_num_frames"] == 6


@pytest.mark.slow
def test_val_metric_aggregation_production_shapes(tmp_path):
    """Cross-process val aggregation at the PRODUCTION padding (n2=1000,
    n3=2000, L=8, C=256 — reference configs/experiment/test_GATsSPG.yaml)
    so shape/sharding bugs invisible at toy sizes cannot hide (VERDICT r4
    item 7). Single block, 4 items — CPU cost is bounded."""
    results = _launch(
        "val", str(tmp_path),
        data={"n_items": 4, "n2": 1000, "n3": 2000, "L": 8, "C": 256,
              "d_model": 256, "num_blocks": 1},
        timeout=1800,
    )
    r0, r1 = results
    for k in r0["dist"]:
        assert r0["dist"][k] == pytest.approx(r1["dist"][k], abs=1e-9), k
    for k, v in r0["dense"].items():
        assert r0["dist"][k] == pytest.approx(v, abs=1e-9), k
    assert r0["dist"]["val_num_frames"] == 4


@pytest.mark.slow
def test_train_step_spans_processes(tmp_path):
    """THE process-spanning pjit gate (VERDICT r4 item 1): one jitted
    production-padding train step over a global (data=2, points=4) mesh
    whose 8 devices live in 2 separate OS processes (4 local CPU devices
    each). The data/batch axis crosses the process (DCN) boundary; the
    3D-point axis is sharded within each process. Loss must match a
    process-local dense single-device run; a second step must execute on
    the updated global state. Reference: one DDP program across ranks
    (train.py:73, src/utils/comm.py:84-98)."""
    results = _launch(
        "train", str(tmp_path), local_devices=4, timeout=1800,
    )
    r0, r1 = results
    for r in results:
        assert r["mesh"] == {"data": 2, "points": 4}
        assert r["n_global_devices"] == 8
        assert (r["n2"], r["n3"], r["L"], r["blocks"]) == (1000, 2000, 8, 4)
    # Replicated loss identical across processes, equal to dense.
    assert r0["loss_step1"] == pytest.approx(r1["loss_step1"], rel=1e-12)
    assert r0["loss_step1"] == pytest.approx(r0["loss_dense"], rel=1e-4)
    assert r0["loss_step2"] < r0["loss_step1"]


@pytest.mark.slow
def test_serving_spans_processes(tmp_path):
    """Process-spanning SPMD serving: PosePipeline.sharded jitted over the
    2-process global mesh — frames sharded across processes, matcher
    3D-point axis sharded within each; every process's addressable pose
    shards must match the dense single-device pipeline."""
    results = _launch(
        "serve", str(tmp_path), local_devices=4, timeout=1800,
    )
    for r in results:
        assert r["mesh"] == {"data": 2, "points": 4}
        assert r["frames_checked_locally"] >= 1
        assert r["match_agreement"] > 0.999
    assert sum(r["frames_checked_locally"] for r in results) >= 2


@pytest.mark.slow
def test_serving_spans_processes_production_crop(tmp_path):
    """Process-spanning serving at the PRODUCTION 512 crop (reference
    local_feature_2D_detector.py:160-186): the SuperPoint conv/extract
    stages cross the process boundary at production image shape, not just
    the matcher padding."""
    results = _launch(
        "serve", str(tmp_path), local_devices=4,
        data={"hw": 512}, timeout=2400,
    )
    for r in results:
        assert r["mesh"] == {"data": 2, "points": 4}
        assert r["match_agreement"] > 0.999
    assert sum(r["frames_checked_locally"] for r in results) >= 2


@pytest.mark.slow
def test_infer_roster_process_sharded(tmp_path):
    """Two processes, two object sequences: `infer` strides the roster
    per process and combines recall counts exactly — both ranks report
    identical full-roster aggregate metrics while evaluating disjoint
    sequence shares."""
    from onepose_tpu.__main__ import main as cli_main
    from tests.test_cli import build_sequence

    rng = np.random.default_rng(21)
    seq_dirs = []
    for name in ("a", "b"):
        seq = build_sequence(tmp_path / name, rng, n_frames=6, img=96,
                             n_pts=30)
        rc = cli_main(
            [
                "map", f"data_dir={seq}", "max_keypoints=64",
                "num_covis=3", "max_points3d=200",
            ]
        )
        assert rc == 0
        # Distinct basenames so per_seq keys don't collide (both builds
        # name the sequence dir 'seq'); the anno default resolves from
        # the parent dir, which is unchanged.
        renamed = osp.join(osp.dirname(seq), f"seq_{name}")
        os.rename(seq, renamed)
        seq_dirs.append(renamed)

    results = _launch(
        "infer", str(tmp_path), data={"seq_dirs": seq_dirs},
    )
    r0, r1 = results
    # Identical full-roster aggregates on every rank.
    for k, v in r0["agg"].items():
        assert r1["agg"][k] == pytest.approx(v, abs=1e-9), k
    assert r0["agg"]["num_frames"] == 12
    # Disjoint local shares covering the roster.
    assert not set(r0["local_seqs"]) & set(r1["local_seqs"])
    assert len(r0["local_seqs"]) + len(r1["local_seqs"]) == 2


@pytest.mark.slow
def test_real_train_loop_spans_processes(tmp_path):
    """The ACTUAL training driver (train/loop.py train()) executed by 2
    processes as one SPMD program per step: global (data) mesh, seeded
    identical batch streams with per-process addressable shards, params
    replicated, rank-0-only metrics/checkpoints, process-sharded pose
    validation. Loss history must match a single-process run of the same
    train() on this host (reduction-order tolerance) — reference DDP
    Trainer parity for the real loop, not a hand-built step."""
    results = _launch("train_loop", str(tmp_path), timeout=1800)
    r0, r1 = results
    assert r0["losses"] == pytest.approx(r1["losses"], rel=1e-12)
    assert r0["val_cmd5"] == pytest.approx(r1["val_cmd5"], abs=1e-12)
    # Only rank 0 writes metrics/checkpoints.
    assert osp.exists(osp.join(str(tmp_path), "metrics.jsonl"))
    assert osp.exists(osp.join(str(tmp_path), "ckpt"))

    # Single-process reference with the identical dataset/config.
    import tests.mp_worker as mpw
    from onepose_tpu.models.gats_spg import GATsSPG
    from onepose_tpu.train.loop import LoopConfig, train
    from onepose_tpu.train.train_step import TrainConfig

    n2, n3, L, C = 24, 32, 2, 32
    items = mpw._val_items(n_items=8, n2=n2, n3=n3, L=L, C=C, seed=5)
    conf_gt = np.zeros((n2, n3), np.float32)
    conf_gt[np.arange(n2), np.arange(n2)] = 1.0
    dataset = [
        {**{k: it[k] for k in (
            "desc2d", "desc3d", "leaf_desc", "mask2d", "mask3d",
            "leaf_mask")}, "conf_gt": conf_gt}
        for it in items
    ]
    out = train(
        dataset,
        model=GATsSPG(d_model=C, num_blocks=1, fused_match=False),
        train_cfg=TrainConfig(steps_per_epoch=2),
        loop_cfg=LoopConfig(
            max_epochs=3, batch_size=4,
            ckpt_dir=str(tmp_path / "ref_ckpt"),
            metrics_file=str(tmp_path / "ref_metrics.jsonl"),
            resume=False, seed=7,
        ),
    )
    ref_losses = [r["train_loss"] for r in out["history"]]
    assert r0["losses"] == pytest.approx(ref_losses, rel=1e-4)


@pytest.mark.slow
def test_map_roster_process_sharded(tmp_path):
    """Two processes, two objects: each rank maps exactly its strided
    share of the roster (cli/map_object.py:123-124) and all artifacts
    land in the shared out_dir."""
    from tests.test_cli import build_sequence

    rng = np.random.default_rng(11)
    seq_a = build_sequence(tmp_path / "a", rng, n_frames=6, img=96,
                           n_pts=30)
    seq_b = build_sequence(tmp_path / "b", rng, n_frames=6, img=96,
                           n_pts=30)
    out_dir = str(tmp_path / "maps")
    results = _launch(
        "map", str(tmp_path),
        data={"seq_dirs": [seq_a, seq_b], "out_dir": out_dir},
    )
    r0, r1 = results
    assert r0["num_objects"] == 1 and r1["num_objects"] == 1
    # Disjoint shares covering the roster.
    assert not set(r0["objects"]) & set(r1["objects"])
    all_objects = sorted(set(r0["objects"]) | set(r1["objects"]))
    assert len(all_objects) == 2
    for name in all_objects:
        assert osp.exists(
            osp.join(out_dir, name, "anno", "anno_index.json")
        ), name
        assert osp.exists(osp.join(out_dir, name, "points.ply")), name
    for points in {**r0["points"], **r1["points"]}.values():
        assert points > 0
