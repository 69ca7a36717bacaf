"""Data layer: dataset directory schema, padding contracts, annotation
I/O, training dataset, capture parsing."""

from onepose_tpu.data import paths
from onepose_tpu.data.padding import (
    pad_keypoints2d,
    pad_points3d,
    assign_to_conf_matrix,
)
from onepose_tpu.data.anno_io import (
    save_annotation_npz,
    load_annotation_npz,
    annotation_from_npz_dir,
)
from onepose_tpu.data.dataset import GATsSPGDataset, batch_iterator
