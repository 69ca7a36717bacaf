"""2D object detection by reference-view feature matching."""

from onepose_tpu.detector.feature_detector import FeatureObjectDetector
