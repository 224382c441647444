#!/bin/sh
# Kernel-variant sweep for the Pallas DCN forward at radius 1 (one process
# per config: the strategy env vars are read at module import).
#   sh tools/dcn_sweep.sh [shapes] [iters]
set -x
SHAPES=${1:-big,mid,small}
ITERS=${2:-30}
for ACCUM in rmw factored; do
  for EXPAND in matmul repeat; do
    SIDE_TPU_DCN_ACCUM=$ACCUM SIDE_TPU_DCN_EXPAND=$EXPAND \
      python tools/dcn_layer_bench.py --shapes "$SHAPES" --iters "$ITERS" \
      --radius 1 2>&1 | grep -E "layer|total"
  done
done
