"""Frame-to-frame tracking with windowed bundle adjustment."""

from onepose_tpu.tracker.ba_tracker import BATracker, TrackerConfig, TrackerState
