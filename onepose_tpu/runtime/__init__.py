"""Runtime: whole-frame on-device inference pipelines."""

from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline
