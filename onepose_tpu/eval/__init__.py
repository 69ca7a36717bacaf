"""Evaluation: cm-degree recall accumulation and result recording."""

from onepose_tpu.eval.evaluator import Evaluator, record_eval_result
