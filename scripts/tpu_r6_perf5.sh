#!/bin/bash
# Round-6 perf drive, part 5: stability rerun of the eval budget on an
# otherwise-idle host (drive 4 ran concurrently with suite chunks), plus an
# on-chip spot check that the standalone --mode noscan fix engages the
# bypass (must print ~57 ms, not ~153).
#   setsid nohup bash scripts/tpu_r6_perf5.sh > /tmp/tpu_r6_perf5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "== r6 perf drive 5 start: $(date) =="
echo "== 1/2 eval millisecond budget (uncontended rerun) =="
python scripts/eval_budget.py --all || exit 1
echo "== 2/2 standalone noscan spot check (expect ~57 ms) =="
python scripts/eval_budget.py --mode noscan || exit 1
echo "== r6 perf drive 5 done: $(date) =="
