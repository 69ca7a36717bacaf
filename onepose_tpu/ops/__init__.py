"""Compute ops: bundle-adjustment LM solver, optical flow, Pallas kernels."""

from onepose_tpu.ops.lm import ba_solve, snavely_residuals
from onepose_tpu.ops.optical_flow import pyramidal_lk
