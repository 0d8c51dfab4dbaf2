#!/bin/bash
# Round-6 perf drive, part 3: the legs part 2 could not finish —
#  - eval_budget with the FAITHFUL scan_op/surrogate legs (bf16 delta to
#    match the model's dt stream; chain via the small (B,L,N) input; slice
#    readout; CSE-proof distinct bypass pair). Part 2's first run measured
#    scan_op at 6.39 ms/layer vs 4.33 in-situ because the standalone leg
#    ran a *different configuration* (fp32 dt streams + ~0.8 ms harness HBM
#    work per iter).
#  - bench_serving with params as a jit argument (the 332 MB closure
#    constant tripped the relay's HTTP 413 and killed drive 2 at step 5).
#  - audit_bwd (drive 2 exited before step 6).
#   setsid nohup bash scripts/tpu_r6_perf3.sh > /tmp/tpu_r6_perf3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "== r6 perf drive 3 start: $(date) =="

echo "== 1/3 eval millisecond budget (faithful standalone legs) =="
python scripts/eval_budget.py --all || exit 1

echo "== 2/3 serving bundle vs in-process =="
python scripts/bench_serving.py --batch 64 --iters 20 || exit 1

echo "== 3/3 backward issue-rate audit (default form) =="
python scripts/audit_bwd.py || true

echo "== r6 perf drive 3 done: $(date) =="
