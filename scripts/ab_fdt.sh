#!/bin/bash
# A/B the fused-dt scan kernel (AUM_SCAN_FUSE_DT) on the eval bench.
# Runs each arm twice, interleaved (ABAB), so host-load drift hits both.
# Launch detached: setsid nohup bash scripts/ab_fdt.sh > /tmp/ab_fdt.log 2>&1 &
cd "$(dirname "$0")/.."
for rep in 1 2; do
  for fdt in 0 1; do
    echo "=== rep $rep AUM_SCAN_FUSE_DT=$fdt ==="
    AUM_SCAN_FUSE_DT=$fdt python bench.py
  done
done
echo AB_DONE
