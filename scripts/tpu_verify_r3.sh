#!/bin/bash
# Round-3 verify drive: the TPU legs of .claude/skills/verify, serially.
# Launch detached: setsid nohup bash scripts/tpu_verify_r3.sh > /tmp/tpu_verify_r3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "== verify start: $(date) =="

echo "== 1/3 smoke_tpu (kernel vs oracle on-chip) =="
python scripts/smoke_tpu.py || exit 1

echo "== 2/3 graft entry forward on-chip =="
python __graft_entry__.py || exit 1

echo "== 3/3 bench.py =="
python bench.py || exit 1

echo "== verify done: $(date) =="
