#!/bin/bash
# A/B the bf16-staged dual scan prologue (AUM_SCAN_BF16_STAGE) on the eval
# bench (VERDICT r2 #4). Runs each arm twice, interleaved (ABAB), so
# host-load drift hits both arms equally.
# Launch detached: setsid nohup bash scripts/ab_bf16stage.sh > /tmp/ab_bf16.log 2>&1 &
cd "$(dirname "$0")/.."
for rep in 1 2; do
  for st in 0 1; do
    echo "=== rep $rep AUM_SCAN_BF16_STAGE=$st ==="
    AUM_SCAN_BF16_STAGE=$st python bench.py
  done
done
echo AB_DONE
