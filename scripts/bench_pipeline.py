"""Host input-pipeline throughput: can the host feed the chip?

The eval step consumes ~420 clips/s/chip and the train step ~80 (B=12,
docs/ROOFLINE.md); the host side must decode + assemble + featurize at
least that fast or the TPU starves — the reference hides this inside
torch DataLoader workers (dataloader.py:154-233), we measure it.

Measures, on synthetic 16 kHz WAVs of --secs seconds:
  1. host assembly only (native C++ batch decode + label stack + retry
     path) — the part that cannot overlap the device step;
  2. assembly + the jitted on-device featurize (fbank -> SpecAugment ->
     normalize), here on CPU jax — an upper bound on host cost when the
     frontend ALSO runs on host; on TPU the featurize runs on-device and
     overlaps the train step via data/pipeline.py::Prefetcher.

Prints one JSON line. Run CPU-only:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/bench_pipeline.py
NOTE: this build host has ONE CPU core; real TPU-VM hosts have dozens —
scale the reported clips/s by the worker count available there.
"""

import argparse
import json
import os
import sys
import tempfile
import time
import wave as wave_mod

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gen_wavs(root, n, secs, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    entries = []
    for i in range(n):
        path = os.path.join(root, f"clip{i}.wav")
        data = (rng.standard_normal(int(secs * sr)) * 3000).astype("<i2")
        with wave_mod.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(data.tobytes())
        entries.append({"wav": path, "labels": f"/m/{i % 5}"})
    return entries


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-files", type=int, default=96)
    p.add_argument("--secs", type=float, default=10.0)
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3,
                   help="timed passes over the files")
    p.add_argument("--train", type=int, default=1,
                   help="1: train conf (mixup 0.5, SpecAug); 0: eval conf")
    p.add_argument("--target-length", type=int, default=1024)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from aum_tpu.data import AudioConf, AudioJsonDataset, BatchPipeline

    tmp = tempfile.mkdtemp(prefix="aum_pipe_bench_")
    entries = gen_wavs(tmp, args.n_files, args.secs)
    datafile = os.path.join(tmp, "data.json")
    with open(datafile, "w") as f:
        json.dump({"data": entries}, f)
    label_csv = os.path.join(tmp, "labels.csv")
    with open(label_csv, "w") as f:
        f.write("index,mid,display_name\n")
        f.write("\n".join(f"{i},/m/{i},c{i}" for i in range(5)))

    train = bool(args.train)
    tl = args.target_length
    conf = AudioConf(target_length=tl, mixup=0.5 if train else 0.0,
                     freqm=min(48, tl) if train else 0,
                     timem=min(192, tl // 2) if train else 0,
                     mean=-4.2677393, std=4.5689974)
    ds = AudioJsonDataset(datafile, conf, label_csv)
    pipe = BatchPipeline(ds, batch_size=args.batch, train=train,
                         seed=0, num_workers=args.workers)

    def run(host_only):
        pp = BatchPipeline(ds, batch_size=args.batch, train=train, seed=0,
                           num_workers=args.workers)
        if host_only:
            pp._featurize = lambda k, w, nf, y, *a: (w, nf, y)
        # warm epoch (jit compile, page cache)
        for b in pp.batches(0):
            jax.block_until_ready(b)
        t0 = time.perf_counter()
        clips = 0
        for e in range(1, 1 + args.epochs):
            for b in pp.batches(e):
                jax.block_until_ready(b)
                clips += args.batch
        return clips / (time.perf_counter() - t0)

    host_rate = run(host_only=True)
    full_rate = run(host_only=False)
    print(json.dumps({
        "host_assembly_clips_per_sec": round(host_rate, 1),
        "assembly_plus_cpu_featurize_clips_per_sec": round(full_rate, 1),
        "native_decode": bool(pipe._native),
        "batch": args.batch, "workers": args.workers,
        "secs_per_clip": args.secs, "train_conf": train,
        "note": "1-core build host; on-TPU featurize runs on-device and "
                "overlaps the step (Prefetcher), so the feed requirement "
                "is host_assembly >= step consumption",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
