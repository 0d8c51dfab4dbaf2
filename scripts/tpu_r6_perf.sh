#!/bin/bash
# Round-6 on-chip perf drive (VERDICT r4 #1/#2/#9), serial, one TPU client
# at a time. Launch detached:
#   setsid nohup bash scripts/tpu_r6_perf.sh > /tmp/tpu_r6_perf.log 2>&1 &
#
# Results land in this log; transcribe into docs/ROOFLINE.md (+SERVING.md).
set -u
cd "$(dirname "$0")/.."

echo "== r6 perf drive start: $(date) =="

echo "== 1/6 train-step A/B: xprev-form (old) vs x-minus-dBu (new), interleaved x2 =="
for rep in 1 2; do
  echo "-- rep $rep: OLD (AUM_SCAN_BWD_XPREV=1)"
  AUM_SCAN_BWD_XPREV=1 python scripts/bench_train_step.py 12 || exit 1
  echo "-- rep $rep: NEW (default)"
  python scripts/bench_train_step.py 12 || exit 1
done

echo "== 2/6 bwd d-tile sweep with the new kernel (B=12) =="
for db in 384 512 768 1536; do
  echo "-- AUM_SCAN_BWD_DBLOCK=$db"
  AUM_SCAN_BWD_DBLOCK=$db python scripts/bench_train_step.py 12 \
    || echo "-- d-tile $db FAILED (likely scoped-VMEM)"
done

echo "== 3/6 bf16 dB/dC partials timing (precision already killed; timing for the record) =="
AUM_SCAN_BWD_BF16_PARTIALS=1 python scripts/bench_train_step.py 12 || true

echo "== 4/6 eval millisecond budget =="
python scripts/eval_budget.py --all || exit 1

echo "== 5/6 serving bundle vs in-process =="
python scripts/bench_serving.py --batch 64 --iters 20 || exit 1

echo "== 6/6 backward issue-rate audit (new kernel) =="
python scripts/audit_bwd.py || true

echo "== r6 perf drive done: $(date) =="
