#!/bin/bash
# Serial TPU work queue, auto-started the moment the lease recovers.
#
# Launch detached so a session death cannot kill a TPU client mid-run:
#   setsid nohup bash scripts/tpu_recovery_run.sh > /tmp/tpu_run.log 2>&1 &
#
# Waits on scripts/tpu_wait.py's log (the already-running waiter) before
# touching the chip; never kills anything; runs ONE client at a time.
set -u
cd "$(dirname "$0")/.."

echo "== runbook start: $(date) =="

# 1. Wait for the lease. Prefer the detached waiter's verdict; if its
# process is gone without a HEALTHY line, run our own patient waiter.
for i in $(seq 1 720); do
    if grep -q "TPU HEALTHY" /tmp/tpu_wait.log 2>/dev/null; then break; fi
    if ! pgrep -x -f "python scripts/tpu_wait.py" > /dev/null 2>&1 \
       && ! grep -q "TPU HEALTHY" /tmp/tpu_wait.log 2>/dev/null; then
        echo "== waiter gone; starting a fresh one: $(date) =="
        python scripts/tpu_wait.py || { echo "lease never recovered"; exit 1; }
        break
    fi
    sleep 60
done
grep -q "TPU HEALTHY" /tmp/tpu_wait.log 2>/dev/null \
    || { echo "lease never recovered (poll timeout)"; exit 1; }
echo "== lease healthy: $(date) =="

echo "== 1/5 smoke_tpu (kernel vs oracle on-chip) =="
python scripts/smoke_tpu.py || exit 1

echo "== 2/5 scan fwd+bwd A/B (bwd exp2 fold; prior fwd+bwd 22.07 ms) =="
python scripts/roofline.py --scan-only

echo "== 3/5 eval tiling sweep (64M-VMEM chunk/b-tile configs) =="
python scripts/sweep_eval_bench.py "[('baseline l104 bt1', {}), ('l104 bt2', {'AUM_SCAN_BTILE': '2'}), ('l104 bt4', {'AUM_SCAN_BTILE': '4'}), ('l176 bt1', {'AUM_SCAN_LCHUNK_EXACT': '176'}), ('l264 bt1', {'AUM_SCAN_LCHUNK_EXACT': '264'}), ('l176 bt2', {'AUM_SCAN_LCHUNK_EXACT': '176', 'AUM_SCAN_BTILE': '2'})]"

echo "== 4/5 train step (B=12, B=32; prior 150.1 / 408.2 ms) =="
python scripts/bench_train_step.py 12
python scripts/bench_train_step.py 32

echo "== 5/5 bench.py =="
python bench.py

echo "== runbook done: $(date) =="
