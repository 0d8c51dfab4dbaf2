#!/usr/bin/env bash
# One-command LM released-checkpoint drill (VERDICT r4 #8): the LM-side
# analogue of fetch_and_verify.sh. Fetch an HF-format Mamba LM (config.json
# + pytorch_model.bin) -> port (models/lm.py::from_pretrained_hf, mirroring
# the reference's utils/hf.py load path) -> forward -> reference-code parity
# (the actual upstream MambaLMHeadModel, mixer_seq_simple.py:176-264, on CPU
# torch with oracle-stubbed kernels) -> golden record -> golden re-verify.
#
# The build environment has no egress; the chain is proven by
# tests/test_fetch_verify.py::test_fetch_and_verify_lm_chain against a
# loopback HTTP server. The moment the hub is reachable, LM parity is:
#
#   bash scripts/fetch_and_verify_lm.sh --hub state-spaces/mamba-130m \
#       --work /tmp/aum_lm
#
# or from explicit file URLs / mirrors:
#
#   bash scripts/fetch_and_verify_lm.sh --work DIR \
#       --config-url http://.../config.json \
#       --weights-url http://.../pytorch_model.bin \
#       [--weights-sha256 HEX] [--config-sha256 HEX]
#
# --no-ref-parity skips the torch reference leg (torch-less host).
set -u
cd "$(dirname "$0")/.."

hub="" config_url="" weights_url="" work="" ref_parity=1
config_sha256="" weights_sha256=""
while [ $# -gt 0 ]; do
  case "$1" in
    --hub) hub=$2; shift 2 ;;
    --config-url) config_url=$2; shift 2 ;;
    --weights-url) weights_url=$2; shift 2 ;;
    --work) work=$2; shift 2 ;;
    --config-sha256) config_sha256=$2; shift 2 ;;
    --weights-sha256) weights_sha256=$2; shift 2 ;;
    --no-ref-parity) ref_parity=0; shift ;;
    *) echo "unknown flag $1"; exit 2 ;;
  esac
done
[ -n "$work" ] || { echo "need --work DIR"; exit 2; }
mkdir -p "$work"

if [ -n "$hub" ]; then
  model="$hub"
  echo "=== [1/3] hub model $hub (transformers cached_file resolves both files)"
else
  [ -n "$config_url" ] && [ -n "$weights_url" ] || {
    echo "need --hub or both --config-url and --weights-url"; exit 2; }
  model="$work/model"
  mkdir -p "$model"
  echo "=== [1/3] fetch config + weights"
  python scripts/fetch_ckpt.py --url "$config_url" \
    --out "$model/config.json" \
    ${config_sha256:+--sha256 "$config_sha256"} || exit 1
  python scripts/fetch_ckpt.py --url "$weights_url" \
    --out "$model/pytorch_model.bin" \
    ${weights_sha256:+--sha256 "$weights_sha256"} || exit 1
fi

echo "=== [2/3] port + forward + reference-code parity + golden record"
vargs=(--model "$model" --record-to "$work/golden_lm.npz")
[ "$ref_parity" -eq 1 ] && vargs+=(--ref-parity)
python scripts/verify_lm.py "${vargs[@]}" || exit 1

echo "=== [3/3] re-verify against the recorded golden (round-trip)"
python scripts/verify_lm.py --model "$model" \
  --golden "$work/golden_lm.npz" || exit 1
echo "=== fetch_and_verify_lm OK"
