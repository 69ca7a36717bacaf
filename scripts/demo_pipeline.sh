#!/bin/bash
# One-command demo pipeline (reference scripts/demo_pipeline.sh):
# parse the scanned capture, build the object map, run the demo video.
#
# Usage: scripts/demo_pipeline.sh /path/to/demo/<obj> [--with-tracking]
# Expects the OnePose-Cap layout: <obj>/<obj>-annotate/ (Frames.m4v,
# ARposes.txt, Box.txt, Frames.txt) and <obj>/<obj>-test/.
set -euo pipefail

OBJ_DIR=$1
OBJ_NAME=$(basename "$OBJ_DIR")
WITH_TRACKING=false
for a in "$@"; do
    [[ "$a" == "-u" || "$a" == "--with-tracking" ]] && WITH_TRACKING=true
done

echo '-------------------'
echo 'Parse scanned data:'
echo '-------------------'
python -m onepose_tpu parse-scan \
    "data_dir=$OBJ_DIR/$OBJ_NAME-annotate" \
    "out_dir=$OBJ_DIR/$OBJ_NAME-annotate-parsed"
python -m onepose_tpu parse-scan \
    "data_dir=$OBJ_DIR/$OBJ_NAME-test" \
    "out_dir=$OBJ_DIR/$OBJ_NAME-test-parsed"

echo '--------------------------------------------------------------'
echo 'Run SfM to reconstruct object point cloud for pose estimation:'
echo '--------------------------------------------------------------'
python -m onepose_tpu map \
    "data_dir=$OBJ_DIR/$OBJ_NAME-annotate-parsed" \
    "out_dir=$OBJ_DIR/sfm_model" \
    ${MAP_ARGS:-}

echo '-----------------------------------'
echo 'Run inference and output demo video:'
echo '-----------------------------------'
python -m onepose_tpu demo \
    "data_dir=$OBJ_DIR/$OBJ_NAME-test-parsed" \
    "anno_dir=$OBJ_DIR/sfm_model/anno" \
    "out_dir=$OBJ_DIR/demo_out" \
    use_tracking=$WITH_TRACKING make_video=true \
    ${DEMO_ARGS:-}
echo "demo video under $OBJ_DIR/demo_out"
