"""Generate per-sample balanced-sampling weights CSV for AudioSet.

Equivalent of /root/reference/exps/audioset/gen_weight_file.py:44-70:
weight(sample) = sum over its labels of 1000 / (class_count + 0.01).

Usage:
    python scripts/gen_weight_file.py --data unbalanced.json \
        --label-csv labels.csv --out weights.csv
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--label-csv", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from aum_tpu.data import AudioConf, AudioJsonDataset
    from aum_tpu.data.pipeline import balanced_sample_weights

    ds = AudioJsonDataset(args.data, AudioConf(), args.label_csv)
    weights = balanced_sample_weights(ds)
    with open(args.out, "w") as f:
        for d, w in zip(ds.data, weights):
            f.write(f"{d['wav']},{w}\n")
    print(f"wrote {len(weights)} weights -> {args.out}")


if __name__ == "__main__":
    main()
