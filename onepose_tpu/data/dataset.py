"""Training/eval dataset for the GATsSPG matcher.

Behavioral spec from the reference GATsSPGDataset
(src/datasets/GATs_spg_dataset.py): items are images listed in an
annotation index; per item load the per-image 2D annotation (keypoints,
descriptors, scores, GT assign matrix) and the object's 3D annotation
(average descriptors + leaf collection), pad everything to static shapes
(shape2d=1000, shape3d=2000, num_leaf=8), and build the GT confidence
matrix. Per-object 3D annotations are cached across items.

This implementation is torch-free numpy, emits masks alongside every
padded tensor, and ships a simple shuffling batch iterator producing
pytrees ready for jax.device_put.
"""

from __future__ import annotations

import os.path as osp
from typing import Iterator, Optional

import numpy as np

from onepose_tpu.data import paths as path_utils
from onepose_tpu.data.anno_io import (
    load_anno2d,
    load_annotation_npz,
    read_anno_index,
)
from onepose_tpu.data.padding import (
    assign_to_conf_matrix,
    pad_keypoints2d,
    pad_points3d,
)
from onepose_tpu.sfm.aggregate import build_leaf_slots


class GATsSPGDataset:
    def __init__(
        self,
        anno_index_file: str,
        num_leaf: int = 8,
        split: str = "train",
        shape2d: int = 1000,
        shape3d: int = 2000,
        load_pose_gt: bool = False,
        seed: int = 0,
    ):
        self.entries = read_anno_index(anno_index_file)
        self.num_leaf = num_leaf
        self.split = split
        self.shape2d = shape2d
        self.shape3d = shape3d
        self.load_pose_gt = load_pose_gt
        self.rng = np.random.default_rng(seed)
        self._anno3d_cache: dict[str, dict] = {}

    def __len__(self) -> int:
        return len(self.entries)

    def _anno3d(self, anno_dir: str) -> dict:
        if anno_dir not in self._anno3d_cache:
            raw = load_annotation_npz(anno_dir)
            padded = pad_points3d(
                raw["keypoints3d"], raw["desc_avg"], raw["scores_avg"],
                self.shape3d, rng=self.rng,
            )
            leaves = build_leaf_slots(
                raw["desc_concat"], raw["scores_concat"], raw["idxs"],
                self.num_leaf, rng=self.rng,
            )
            C = raw["desc_avg"].shape[-1]
            leaf_desc = np.ones(
                (self.shape3d, self.num_leaf, C), np.float32
            )
            leaf_mask = np.zeros((self.shape3d, self.num_leaf), bool)
            k = min(len(raw["idxs"]), self.shape3d)
            leaf_desc[:k] = leaves["leaf_desc"][:k]
            leaf_mask[:k] = leaves["leaf_mask"][:k]
            self._anno3d_cache[anno_dir] = {
                "padded": padded,
                "leaf_desc": leaf_desc,
                "leaf_mask": leaf_mask,
                "num_3d": len(raw["idxs"]),
            }
        return self._anno3d_cache[anno_dir]

    def __getitem__(self, index: int) -> dict:
        entry = self.entries[index]
        anno2d = load_anno2d(entry["anno_file"])
        anno_dir = osp.dirname(entry["anno_file"])
        # Per-object 3D annotation: anno_file lives either in the object's
        # anno/ dir or beside it; the entry can override explicitly.
        anno3d_dir = entry.get("anno3d_dir", anno_dir)
        a3 = self._anno3d(anno3d_dir)

        # Image size for random keypoint padding: stored or read lazily.
        if "height" in entry:
            h, w = int(entry["height"]), int(entry["width"])
        else:
            import cv2

            img = cv2.imread(entry["img_file"], cv2.IMREAD_GRAYSCALE)
            h, w = img.shape

        n2d = len(anno2d["keypoints2d"])
        p2 = pad_keypoints2d(
            anno2d["keypoints2d"], anno2d["descriptors2d"],
            anno2d["scores2d"], h, w, self.shape2d, rng=self.rng,
        )
        conf_gt = assign_to_conf_matrix(
            anno2d["assign_matrix"], n2d, a3["num_3d"],
            self.shape2d, self.shape3d,
        )
        item = {
            "desc2d": p2["descriptors"],
            "kpts2d": p2["keypoints"],
            "scores2d": p2["scores"],
            "mask2d": p2["mask"],
            "desc3d": a3["padded"]["descriptors"],
            "points3d": a3["padded"]["points3d"],
            "mask3d": a3["padded"]["mask"],
            "leaf_desc": a3["leaf_desc"],
            "leaf_mask": a3["leaf_mask"],
            "conf_gt": conf_gt,
        }
        if self.load_pose_gt:
            item["pose_gt"] = np.loadtxt(entry["pose_file"]).astype(
                np.float32
            )
            item["K"] = np.loadtxt(
                path_utils.intrin_path_by_color(entry["img_file"])
            ).astype(np.float32)
        return item


def batch_iterator(
    dataset: GATsSPGDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    num_workers: int = 0,
) -> Iterator[dict]:
    """Stacked numpy batches (pytrees of [B, ...] arrays).

    num_workers > 0 assembles batches in a thread pool (the reference
    trains with a 16-worker torch DataLoader,
    src/datamodules/GATs_spg_datamodule.py:56-60); item loading is
    numpy/cv2 IO that releases the GIL, so threads overlap it with the
    device step without multiprocessing pickling."""
    order = np.arange(len(dataset))
    rng = np.random.default_rng(seed)
    if shuffle:
        rng.shuffle(order)
    end = len(order) - (len(order) % batch_size if drop_last else 0)

    def assemble(idx):
        items = [dataset[int(i)] for i in idx]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    starts = [
        order[s : s + batch_size]
        for s in range(0, end, batch_size)
        if not (drop_last and len(order[s : s + batch_size]) < batch_size)
    ]
    if num_workers <= 0:
        for idx in starts:
            yield assemble(idx)
        return

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        futures = [pool.submit(assemble, idx) for idx in starts]
        for fut in futures:
            yield fut.result()


def prefetch_to_device(iterator: Iterator[dict], size: int = 2):
    """Stage upcoming host batches onto the device while the current step
    runs (the on-device half of DataLoader pipelining)."""
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        queue.append(jax.tree.map(jax.device_put, batch))

    for batch in iterator:
        put(batch)
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
