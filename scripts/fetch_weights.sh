#!/usr/bin/env bash
# Download every published checkpoint from the reference registry
# (alonet/common/weights.py:6-31) into ~/.aloception_tpu/weights/ and print
# each file's sha256 so WEIGHTS.md's pin column can be filled. Requires
# network egress — the build environment has none; run this on weight-drop
# day from any connected machine.
set -euo pipefail

DEST="${ALO_WEIGHTS_DIR:-$HOME/.aloception_tpu/weights}"
BASE="https://storage.googleapis.com/visualbehavior-publicweights"
mkdir -p "$DEST"

declare -A FILES=(
  [detr-r50.pth]="$BASE/detr-r50/detr-r50.pth"
  [deformable-detr-r50.pth]="$BASE/detr-r50-deformable/deformable-detr-r50.pth"
  [deformable-detr-r50-refinement.pth]="$BASE/detr-r50-deformable-refinement/deformable-detr-r50-refinement.pth"
  [detr-r50-panoptic.pth]="$BASE/detr-r50-panoptic/detr-r50-panoptic.pth"
  [raft-things.pth]="$BASE/raft-things/raft-things.pth"
  [raft-chairs.pth]="$BASE/raft-chairs/raft-chairs.pth"
  [raft-sintel.pth]="$BASE/raft-sintel/raft-sintel.pth"
  [raft-kitti.pth]="$BASE/raft-kitti/raft-kitti.pth"
  [raft-small.pth]="$BASE/raft-small/raft-small.pth"
)

for name in "${!FILES[@]}"; do
  out="$DEST/$name"
  if [ ! -f "$out" ]; then
    echo "fetching $name"
    curl -fL --retry 3 -o "$out" "${FILES[$name]}"
  fi
  sha256sum "$out"
done
echo "done — record the sha256s above in WEIGHTS.md"
