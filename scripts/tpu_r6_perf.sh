#!/bin/bash
# Round-6 on-chip perf drive (VERDICT r4 #1/#2/#9), serial, one TPU client
# at a time. Launch detached:
#   setsid nohup bash scripts/tpu_r6_perf.sh > /tmp/tpu_r6_perf.log 2>&1 &
#
# Results land in this log; transcribe into docs/ROOFLINE.md (+SERVING.md).
#
# NOTE: the knobs below reflect the FINAL round-6 semantics — xprev is the
# default dla form and AUM_SCAN_BWD_XMINUS/DBU select the measured-negative
# variants. (The original revision of this script predated that flip and
# used the now-removed AUM_SCAN_BWD_XPREV=1; the recorded round-6 numbers
# came from that run plus tpu_r6_perf{2,3,4}.sh.) Recorded results:
# xprev 148.0-149.0 ms; xminus 153.1-153.4; dbu 153.1-153.2; d-tile
# 384/512/768/1536 = 156.8/148.4/148.7-149.0/172.7; bf16 partials 149.3
# (B=12, interleaved). Full tables: docs/ROOFLINE.md "Backward" round-6
# addendum + "The eval step, itemized"; serving: docs/SERVING.md.
set -u
cd "$(dirname "$0")/.."

echo "== r6 perf drive start: $(date) =="

echo "== 1/6 dla-form A/B: xprev (default) vs xminus vs dbu, interleaved x2 =="
for rep in 1 2; do
  echo "-- rep $rep: XPREV (default)"
  python scripts/bench_train_step.py 12 || exit 1
  echo "-- rep $rep: XMINUS"
  AUM_SCAN_BWD_XMINUS=1 python scripts/bench_train_step.py 12 || exit 1
  echo "-- rep $rep: DBU"
  AUM_SCAN_BWD_DBU=1 python scripts/bench_train_step.py 12 || exit 1
done

echo "== 2/6 bwd d-tile sweep, default form (B=12) =="
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
python scripts/bench_serving.py --batch 64 --iters 50 || exit 1

echo "== 6/6 backward issue-rate audit (default form) =="
python scripts/audit_bwd.py || true

echo "== r6 perf drive done: $(date) =="
