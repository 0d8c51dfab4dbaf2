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
# Prints a per-chunk pass/fail table and an aggregate passed/failed count at
# the end (VERDICT r3 #3); a green run should be recorded in
# docs/SUITE_RUNS.md (host, date, HEAD sha, counts).
#
# Usage: bash scripts/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
# XLA-CPU compilations dominate suite wall-clock (test_runner alone ~30 min
# on a slow host); jax's persistent compile cache keeps re-runs fast. The
# cache is keyed on backend+flags, so the CPU suite and the TPU bench don't
# collide (both default to ~/.cache/aum_tpu_jax via aum_tpu/__init__.py).
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/aum_tpu_jax}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="${JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS:-1}"
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

CHUNKS=(
  "tests/test_ast_rope.py tests/test_aux.py tests/test_conv_kernel.py tests/test_data.py tests/test_epic.py tests/test_fbank.py tests/test_goldens.py tests/test_graft_entry.py"
  "tests/test_drop_path.py"
  "tests/test_lm.py tests/test_model.py tests/test_multihost.py"
  "tests/test_runner.py"
  "tests/test_scan_partition.py tests/test_selective_scan.py tests/test_seq_parallel.py tests/test_serving.py"
  "tests/test_tp_layout.py tests/test_pipeline.py"
  "tests/test_fetch_verify.py"
  "tests/test_torch_port.py tests/test_train.py"
  "tests/test_ref_parity.py"
)

# Completeness check (ADVICE r3): every tests/test_*.py must be in a chunk,
# so a new module can't silently go unexercised by the supported invocation.
listed=" $(echo "${CHUNKS[@]}") "
missing=0
for f in tests/test_*.py; do
  case "$listed" in
    *" $f "*) ;;
    *) echo "ERROR: $f is not listed in run_suite.sh CHUNKS"; missing=1 ;;
  esac
done
if [ "$missing" -ne 0 ]; then
  echo "=== suite rc=2 (chunk list incomplete)"
  exit 2
fi

# Compile-count guard (VERDICT r4 #6): the observed XLA-CPU LLVM-JIT
# segfault hits after ~110 tests' worth of compiles in one process, and a
# second crash family hit at ~2/3 that in a compile-cache write. Refuse any
# chunk whose STATIC test-function count exceeds 75 (margin under the ~110
# empirical budget; pytest parametrize expands beyond the static count, so
# keep headroom) — this turns the next oversized chunk into a loud config
# error instead of a mid-run segfault.
MAX_CHUNK_TESTS=75
oversize=0
for i in "${!CHUNKS[@]}"; do
  # shellcheck disable=SC2086
  n=$(grep -ch '^def test_\|^    def test_' ${CHUNKS[$i]} | awk '{s+=$1} END {print s+0}')
  if [ "$n" -gt "$MAX_CHUNK_TESTS" ]; then
    echo "ERROR: chunk $((i + 1)) has $n test functions > $MAX_CHUNK_TESTS" \
         "(XLA-CPU compile-crash budget; split the chunk)"
    oversize=1
  fi
done
if [ "$oversize" -ne 0 ]; then
  echo "=== suite rc=3 (oversized chunk)"
  exit 3
fi

rc=0
total_passed=0
total_failed=0
declare -a RESULTS
for i in "${!CHUNKS[@]}"; do
  echo "=== chunk $((i + 1))/${#CHUNKS[@]}: ${CHUNKS[$i]}"
  log=$(mktemp)
  # shellcheck disable=SC2086
  python -m pytest ${CHUNKS[$i]} -q "$@" 2>&1 | tee "$log"
  c=${PIPESTATUS[0]}
  tally=$(grep -Eo '[0-9]+ (passed|failed|error)' "$log" | awk '
    /passed/ {p+=$1} /failed/ {f+=$1} /error/ {f+=$1} END {print p+0, f+0}')
  p=${tally% *}; f=${tally#* }
  total_passed=$((total_passed + p))
  total_failed=$((total_failed + f))
  RESULTS[$i]="chunk $((i + 1)): rc=$c passed=$p failed=$f"
  rm -f "$log"
  if [ "$c" -ne 0 ]; then
    rc=$c
    echo "=== chunk $((i + 1)) FAILED rc=$c"
  fi
done
echo "=== suite summary"
for r in "${RESULTS[@]}"; do echo "  $r"; done
echo "=== suite total: passed=$total_passed failed=$total_failed rc=$rc (HEAD $(git rev-parse --short HEAD 2>/dev/null))"
exit $rc
