#!/usr/bin/env bash
# Full test suite in process-isolated chunks.
#
# Why not one `pytest tests/`: on this image, a single long-lived process
# accumulating many XLA-CPU compiles eventually SEGFAULTS inside
# backend_compile_and_load (LLVM JIT) — observed six times at the same
# point (test_runner::test_run_eval_wa_and_ensemble's model-init compile,
# ~110 tests in), with torch loaded AND with torch never imported
# (faulthandler module list had no torch), on two hosts, with 126 GB RAM
# free. Every module passes in a fresh process. Chunking bounds the
# per-process compile count; the split keeps the torch-heavy parity module
# in its own (last) process, matching tests/conftest.py's ordering rationale.
#
# Usage: bash scripts/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

CHUNKS=(
  "tests/test_ast_rope.py tests/test_aux.py tests/test_conv_kernel.py tests/test_data.py tests/test_epic.py tests/test_fbank.py tests/test_goldens.py tests/test_graft_entry.py"
  "tests/test_lm.py tests/test_model.py tests/test_multihost.py"
  "tests/test_runner.py"
  "tests/test_scan_partition.py tests/test_selective_scan.py tests/test_seq_parallel.py tests/test_serving.py"
  "tests/test_torch_port.py tests/test_train.py"
  "tests/test_ref_parity.py"
)

rc=0
for i in "${!CHUNKS[@]}"; do
  echo "=== chunk $((i + 1))/${#CHUNKS[@]}: ${CHUNKS[$i]}"
  # shellcheck disable=SC2086
  python -m pytest ${CHUNKS[$i]} -q "$@"
  c=$?
  if [ "$c" -ne 0 ]; then
    rc=$c
    echo "=== chunk $((i + 1)) FAILED rc=$c"
  fi
done
echo "=== suite rc=$rc"
exit $rc
