"""CLI dispatcher: `python -m onepose_tpu <command> [--config X] [K=V ...]`.

Commands mirror the reference entry points (SURVEY.md §3):
  map         run.py sfm pipeline (object mapping)
  train       train.py (GATsSPG training)
  infer       inference.py (GT-box evaluation)
  demo        inference_demo.py (detection + tracking video)
  detect      feature_matching_object_detector.py (writes color_det/,
              intrin_det/)
  merge-anno  run.py merge_anno (merged train/val indices, COCO export)
  parse-scan  parse_scanned_data.py
  video2img   video2img.py
"""

from __future__ import annotations

import argparse
import sys

from onepose_tpu.config import load_config


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="onepose_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    from onepose_tpu.cli import (
        convert_cmd,
        demo,
        detect_cmd,
        infer,
        map_object,
        merge_anno_cmd,
        parse_scan_cmd,
        train_cmd,
    )

    map_object.add_parser(sub)
    infer.add_parser(sub)
    train_cmd.add_parser(sub)
    parse_scan_cmd.add_parser(sub)
    demo.add_parser(sub)
    detect_cmd.add_parser(sub)
    merge_anno_cmd.add_parser(sub)
    convert_cmd.add_parser(sub)

    args = parser.parse_args(argv)
    cfg = load_config(args._defaults, args.config, args.overrides)
    from onepose_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache(cfg.pop("compilation_cache_dir", None))
    args._run(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
