#!/bin/bash
# Round-6 perf drive, part 4: noise-hardened re-runs for the final numbers.
#  - eval_budget with per-mode chain lengths (96 iters on the sub-ms legs:
#    drive-3's 8-iter runs swung 2-6x run-to-run on norms/conv) and the
#    DCE-proof surrogate readout.
#  - bench_serving at 50 iters (20-iter sequential-dispatch delta was +4.9%
#    with ms-level dispatch noise on ~200 ms calls).
#   setsid nohup bash scripts/tpu_r6_perf4.sh > /tmp/tpu_r6_perf4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "== r6 perf drive 4 start: $(date) =="

echo "== 1/2 eval millisecond budget (per-mode iters) =="
python scripts/eval_budget.py --all || exit 1

echo "== 2/2 serving bundle vs in-process (50 iters) =="
python scripts/bench_serving.py --batch 64 --iters 50 || exit 1

echo "== r6 perf drive 4 done: $(date) =="
