#!/usr/bin/env bash
# One-command released-checkpoint drill (VERDICT r3 #4):
#   download -> sha256 -> port -> reference-code parity -> golden record ->
#   (optional, when datafiles exist) dataset-level eval.
#
# The reference's headline is its checkpoint table
# (/root/reference/README.md:106-140); the build environment has no egress,
# so the whole chain is proven by tests/test_fetch_verify.py against a
# loopback HTTP server serving a synthetic .pth. The moment a released
# checkpoint is reachable, each README row is one command:
#
#   bash scripts/fetch_and_verify.sh --release as20k-base --work /tmp/aum \
#       [--wav clip1.wav clip2.flac ...] \
#       [--data-eval eval.json --label-csv class_labels_indices.csv]
#
# or for an arbitrary file / mirror:
#
#   bash scripts/fetch_and_verify.sh --url <http-or-drive-link> --work DIR \
#       --model-type base --aum-type Fo-Bi --n-class 527 --audio-length 1024 \
#       --dataset-mean -4.2677393 --dataset-std 4.5689974 [...]
#
# Flags: --sha256 HEX (verify the download; recorded to .pth.sha256 either
# way), --no-ref-parity (skip the torch reference-code leg, e.g. torch-less
# host), --fbank-npz F (precomputed features instead of --wav).
set -u
cd "$(dirname "$0")/.."

# Release table transcribed from /root/reference/README.md:106-140:
#   key -> drive_id model_type aum_type n_class audio_len mean std recipe expected_metric
declare -A REL
REL[audioset-base]="1QgnyvGYxKd-q6twXf4i05jZA5xFIFs8j base Fo-Bi 527 1024 -4.2677393 4.5689974 audioset/aum-base_scratch mAP=32.74"
REL[as20k-base]="11cbL_vizFFD7i6RvErSSEi9E3gRRIQWA base Fo-Bi 527 1024 -4.2677393 4.5689974 as20k/aum-base_scratch mAP=14.05"
REL[vggsound-base]="1eAn8WEkfnB5pdon8o3PZMwFBsuuPu2L0 base Fo-Bi 309 1024 -5.0767093 4.4533687 vggsound/aum-base_scratch acc=42.97"
REL[voxceleb-base]="1Y3LboHg1RYLsuoKfOT3u4odF6opJZXlw base Fo-Bi 1251 1024 -3.7614744 4.2011642 voxceleb/aum-base_scratch acc=33.12"
REL[spc2-base]="1wLFjYZxvJs2YBvDLYqOxVhMJnPKfhX5Z base Fo-Bi 35 128 -6.845978 5.5654526 speechcommands/aum-base_scratch acc=94.44"
REL[epic-base]="1vLX3LjAggNAusW6B17s9uc2OoduvnvJi base Fo-Bi 44 1024 -6.627534 4.4917786 epic_sounds/aum-base_scratch acc=44.92"
REL[audioset-small]="1z-JdZTy52gW7RzhiTQozn6Ly2W4DOs9b small Bi-Bi 527 1024 -4.2677393 4.5689974 audioset/aum-base_scratch mAP=39.74"
REL[as20k-small]="1XDlZEHe0xQXnOLFh3CJVaS5cmZW_7C-t small Bi-Bi 527 1024 -4.2677393 4.5689974 as20k/aum-base_scratch mAP=29.17"
REL[vggsound-small]="11mEtjfHjkGGFjxVHvXIAX60KrBgWwWhQ small Bi-Bi 309 1024 -5.0767093 4.4533687 vggsound/aum-base_scratch acc=49.61"
REL[voxceleb-small]="1NoherLBbOP5eE1iMQ8joas1k0lYwAmd8 small Bi-Bi 1251 1024 -3.7614744 4.2011642 voxceleb/aum-base_scratch acc=41.78"
REL[spc2-small]="1jhUKxzUo2TMHrd1a2vojjv1x9De_HyFe small Bi-Bi 35 128 -6.845978 5.5654526 speechcommands/aum-base_scratch acc=97.61"
REL[epic-small]="1i9ANh01FWB8UY9ruQ81Ov5UnoXuhq0PQ small Bi-Bi 44 1024 -6.627534 4.4917786 epic_sounds/aum-base_scratch acc=53.45"
REL[vggsound-base-as]="1spsJXncpEXHKmIvDcB7ddkcgrzARpEeK base Fo-Bi 309 1024 -5.0767093 4.4533687 vggsound/aum-base_scratch acc=46.78"
REL[voxceleb-base-as]="1dqWSIKTvA0wqKy-XTXYn-MUourMtHGrQ base Fo-Bi 1251 1024 -3.7614744 4.2011642 voxceleb/aum-base_scratch acc=41.82"
REL[spc2-base-as]="1ikkU4COOqeCNCVTn4b7LulNr9p4Efr4M base Fo-Bi 35 128 -6.845978 5.5654526 speechcommands/aum-base_scratch acc=94.82"
REL[epic-base-as]="1wsRhPqtHryi3PQz1WPJYkMMOPbmOMXrV base Fo-Bi 44 1024 -6.627534 4.4917786 epic_sounds/aum-base_scratch acc=48.31"

url="" release="" work="" sha256="" ref_parity=1 drill_model_type=""
model_type="base" aum_type="Fo-Bi" n_class=527 audio_length=1024
dataset_mean="-4.2677393" dataset_std="4.5689974" recipe="" expected=""
fbank_npz="" data_eval="" label_csv="" wavs=()
while [ $# -gt 0 ]; do
  case "$1" in
    --url) url=$2; shift 2 ;;
    --release) release=$2; shift 2 ;;
    --work) work=$2; shift 2 ;;
    --sha256) sha256=$2; shift 2 ;;
    --no-ref-parity) ref_parity=0; shift ;;
    # Loopback-drill scale override (VERDICT r4 #4): tests walk ALL 16
    # release rows through this exact chain with the row's n_class /
    # audio_length / mean / std / url handling intact, but the model scaled
    # to tiny so 16 ports+forwards stay CPU-feasible. NEVER use with a real
    # released checkpoint — the real row's model_type must match its .pth.
    --drill-model-type) drill_model_type=$2; shift 2 ;;
    --model-type) model_type=$2; shift 2 ;;
    --aum-type) aum_type=$2; shift 2 ;;
    --n-class) n_class=$2; shift 2 ;;
    --audio-length) audio_length=$2; shift 2 ;;
    --dataset-mean) dataset_mean=$2; shift 2 ;;
    --dataset-std) dataset_std=$2; shift 2 ;;
    --fbank-npz) fbank_npz=$2; shift 2 ;;
    --data-eval) data_eval=$2; shift 2 ;;
    --label-csv) label_csv=$2; shift 2 ;;
    --recipe) recipe=$2; shift 2 ;;
    --wav) shift; while [ $# -gt 0 ] && [ "${1#--}" = "$1" ]; do wavs+=("$1"); shift; done ;;
    *) echo "unknown flag $1"; exit 2 ;;
  esac
done

if [ -n "$release" ]; then
  row=${REL[$release]:-}
  if [ -z "$row" ]; then
    echo "unknown --release '$release'; known: ${!REL[*]}"; exit 2
  fi
  read -r drive_id model_type aum_type n_class audio_length dataset_mean dataset_std recipe expected <<<"$row"
  url=${url:-$drive_id}
  echo "release $release: $model_type $aum_type n_class=$n_class len=$audio_length (reference README: $expected)"
fi
if [ -n "$drill_model_type" ]; then
  echo "DRILL: overriding model_type $model_type -> $drill_model_type (loopback test scale)"
  model_type=$drill_model_type
fi
[ -n "$url" ] || { echo "need --url or --release"; exit 2; }
[ -n "$work" ] || { echo "need --work DIR"; exit 2; }
mkdir -p "$work"
ckpt="$work/${release:-ckpt}.pth"

echo "=== [1/4] fetch"
python scripts/fetch_ckpt.py --url "$url" --out "$ckpt" \
  ${sha256:+--sha256 "$sha256"} || exit 1

echo "=== [2/4] port + forward + reference-code parity"
vargs=(--ckpt "$ckpt" --model-type "$model_type" --aum-type "$aum_type"
       --n-class "$n_class" --audio-length "$audio_length"
       --dataset-mean "$dataset_mean" --dataset-std "$dataset_std"
       --record-to "$work/golden_${release:-ckpt}.npz")
if [ -n "$fbank_npz" ]; then vargs+=(--fbank-npz "$fbank_npz")
elif [ ${#wavs[@]} -gt 0 ]; then vargs+=(--wav "${wavs[@]}")
else
  # No clips given: drive the forward on a deterministic synthetic batch so
  # the port + golden record still happen (features ~ N(0,1) post-normalize).
  python - "$work/synth_fb.npz" "$audio_length" <<'PY'
import sys, numpy as np
np.savez(sys.argv[1], x=np.random.default_rng(0).standard_normal(
    (2, int(sys.argv[2]), 128)).astype(np.float32) * 0.5)
PY
  vargs+=(--fbank-npz "$work/synth_fb.npz")
fi
[ "$ref_parity" -eq 1 ] && vargs+=(--ref-parity)
python scripts/verify_ckpt.py "${vargs[@]}" || exit 1
echo "golden recorded: $work/golden_${release:-ckpt}.npz"

echo "=== [3/4] re-verify against the recorded golden (round-trip)"
rvargs=("${vargs[@]}")
for i in "${!rvargs[@]}"; do
  [ "${rvargs[$i]}" = "--record-to" ] && { rvargs[$i]="--golden"; }
  [ "${rvargs[$i]}" = "--ref-parity" ] && unset "rvargs[$i]"
done
python scripts/verify_ckpt.py "${rvargs[@]}" || exit 1

if [ -n "$data_eval" ] && [ -n "$label_csv" ] && [ -n "$recipe" ]; then
  echo "=== [4/4] dataset-level eval (${expected:-recipe $recipe})"
  python -m aum_tpu.run --recipe "$recipe" --run-type eval \
    --ckpt "$ckpt" --data-eval "$data_eval" --label-csv "$label_csv" \
    --exp-dir "$work/eval_${release:-ckpt}" || exit 1
  echo "compare the printed metric to the reference README row: ${expected:-n/a}"
else
  echo "=== [4/4] dataset eval SKIPPED (pass --data-eval + --label-csv + --recipe when datafiles exist)"
fi
echo "=== fetch_and_verify OK"
