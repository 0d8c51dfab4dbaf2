#!/bin/bash
# Round-6 perf drive, part 2: re-runs the legs spoiled in part 1 by
# mid-drive edits (/tmp/tpu_r6_perf.log NameError window) + the dbu variant
# A/B. The backward's default dla form is now xprev (the part-1 A/B winner:
# 148.0/148.9 ms vs 153.1/153.4 for xminus, B=12).
#   setsid nohup bash scripts/tpu_r6_perf2.sh > /tmp/tpu_r6_perf2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "== r6 perf drive 2 start: $(date) =="

echo "== 1/6 dla-form A/B: default (xprev) vs dbu (concat-removal, no in-place), interleaved x2 =="
for rep in 1 2; do
  echo "-- rep $rep: XPREV (default)"
  python scripts/bench_train_step.py 12 || exit 1
  echo "-- rep $rep: DBU"
  AUM_SCAN_BWD_DBU=1 python scripts/bench_train_step.py 12 || exit 1
done

echo "== 2/6 bwd d-tile sweep, default form (B=12) =="
for db in 512 1536; do
  echo "-- AUM_SCAN_BWD_DBLOCK=$db"
  AUM_SCAN_BWD_DBLOCK=$db python scripts/bench_train_step.py 12 \
    || echo "-- d-tile $db FAILED (likely scoped-VMEM)"
done

echo "== 3/6 bf16 dB/dC partials timing (default form) =="
AUM_SCAN_BWD_BF16_PARTIALS=1 python scripts/bench_train_step.py 12 || true

echo "== 4/6 eval millisecond budget =="
python scripts/eval_budget.py --all || exit 1

echo "== 5/6 serving bundle vs in-process =="
python scripts/bench_serving.py --batch 64 --iters 20 || exit 1

echo "== 6/6 backward issue-rate audit (default form) =="
python scripts/audit_bwd.py || true

echo "== r6 perf drive 2 done: $(date) =="
