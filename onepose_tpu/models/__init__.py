"""Neural models: SuperPoint-class extractor, SuperGlue-class 2D-2D matcher,
GATsSPG 2D-3D matcher. All flax modules with static shapes and validity
masks; channel-last layouts; bf16-friendly compute dtypes."""

from onepose_tpu.models.superpoint import SuperPoint, extract_keypoints
from onepose_tpu.models.superglue import SuperGlue
from onepose_tpu.models.gats_spg import GATsSPG
