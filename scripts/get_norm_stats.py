"""Compute dataset fbank mean/std for normalization.

Equivalent of /root/reference/src/get_norm_stats.py:16-29: iterate the
un-normalized (skip_norm) fbank pipeline and accumulate mean/std over all
time-frequency bins.

Usage:
    python scripts/get_norm_stats.py --data data.json --label-csv labels.csv \
        [--target-length 1024] [--batches 100]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--label-csv", required=True)
    p.add_argument("--target-length", type=int, default=1024)
    p.add_argument("--melbins", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--batches", type=int, default=0,
                   help="limit number of batches (0 = all)")
    args = p.parse_args()

    from aum_tpu.data import AudioConf, AudioJsonDataset, BatchPipeline

    conf = AudioConf(num_mel_bins=args.melbins,
                     target_length=args.target_length,
                     skip_norm=True, freqm=0, timem=0, mixup=0.0)
    ds = AudioJsonDataset(args.data, conf, args.label_csv)
    pipe = BatchPipeline(ds, args.batch_size, train=True)

    means, stds = [], []
    for i, batch in enumerate(pipe.batches(0)):
        x = np.asarray(batch["x"])
        means.append(x.mean())
        stds.append(x.std())
        if args.batches and i + 1 >= args.batches:
            break
    print(f"mean={np.mean(means):.7f} std={np.mean(stds):.7f}")


if __name__ == "__main__":
    main()
