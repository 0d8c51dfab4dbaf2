#!/bin/bash
# Round-4 verify drive: the TPU legs of .claude/skills/verify, serially.
# Launch detached: setsid nohup bash scripts/tpu_verify_r4.sh > /tmp/tpu_verify_r4.log 2>&1 &
#
# Round-4 results on this host (2026-08-20): smoke_tpu OK (fwd 3.31 ms
# B=4), entry forward (8, 527) bfloat16, bench 418.28 clips/s
# (vs_baseline 0.644), train step B=12 149.1 ms (80.5 clips/s),
# train_spc_synth final acc 0.375 / AUC 0.72 (14 epochs), ssd_probe:
# factored SSD 9.69-12.78 ms vs 0.345 ms one-direction kernel; TPU-platform
# serving bundle export + load + pad-or-chunk predict green ((3,35) finite).
#
# Round-5 rerun (2026-08-20, after the drop_path/train-rng threading landed,
# /tmp/tpu_verify_r5.log): all 6 legs green — smoke fwd 3.04 ms B=4, entry
# (8, 527) bfloat16, bench 417.4 clips/s (vs_baseline 0.642), train step
# B=12 148.6 ms (80.7 clips/s), train_spc_synth final acc 0.375 (identical
# trajectory — the fold_in-derived dropout rng leaves the k_aug/k_noise
# streams untouched), serving predict (3, 35) finite.
#
# Round-6 rerun (2026-08-21, fresh host, cold caches, after the backward
# variant knobs + eval-budget work, /tmp/tpu_verify_r6.log): all 6 legs
# green — smoke fwd 2.61 ms B=4 (grads rel err <=3.7e-4), entry (8, 527)
# bfloat16, bench 416.98 clips/s (vs_baseline 0.642, vs_target 0.128),
# train step B=12 148.7 ms (80.7 clips/s), train_spc_synth final acc 0.375
# (best epoch 10 — same plateau as r4/r5), serving predict (3, 35) finite.
set -u
cd "$(dirname "$0")/.."

echo "== verify start: $(date) =="

echo "== 1/6 smoke_tpu (kernel vs oracle on-chip) =="
python scripts/smoke_tpu.py || exit 1

echo "== 2/6 graft entry forward on-chip =="
python __graft_entry__.py || exit 1

echo "== 3/6 bench.py =="
python bench.py || exit 1

echo "== 4/6 train-step timing (B=12 bf16 split-remat) =="
python scripts/bench_train_step.py || exit 1

echo "== 5/6 e2e synthetic training slice (14 epochs, beats chance) =="
python scripts/train_spc_synth.py || exit 1

echo "== 6/6 serving bundle export + predict on-chip =="
python scripts/export_serving.py --out /tmp/b_tpu_verify.zip \
  --platforms tpu --batch-sizes 1,4 --set model_type=tiny \
  --set audio_length=128 --set n_class=35 || exit 1
python -c "
import numpy as np
from aum_tpu.serving import load_bundle
b = load_bundle('/tmp/b_tpu_verify.zip')
out = np.asarray(b.predict(np.random.default_rng(0).standard_normal(
    (3, 128, 128)).astype(np.float32)))
assert out.shape == (3, 35) and np.isfinite(out).all(), out.shape
print('serving predict OK', out.shape)" || exit 1

echo "== verify done: $(date) =="
