"""End-to-end training slice on real hardware with synthetic data.

Generates a SpeechCommands-shaped synthetic dataset (class-dependent tones),
then drives the full aum_tpu.run path: datafiles -> native/python decode ->
on-device featurize -> sharded train steps -> per-epoch eval -> checkpoints.
A learnable task: accuracy must beat chance (with margin) by the end.

Calibration note (round 4): the trajectory of this tiny chaotic run is
sensitive to O(1e-8..1e-6) fp-reassociation in the initializers — jitting
model.init (init_train_state does, for the partial-manual shard_map paths)
fuses the truncated-normal erfinv chain differently, which legitimately
shifts early-epoch argmax-accuracy while AUC/d' climb identically
(observed: acc 0.25 vs >0.25 at epoch 8; 0.375 from epoch 10 either way).
The assert therefore runs 14 epochs and checks acc >= 2x chance AND
AUC > 0.6 rather than a knife-edge single-metric cut.

Usage: python scripts/train_spc_synth.py [--model-type tiny] [--depth 4]
"""

import argparse
import json
import os
import sys
import tempfile
import wave as wave_mod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_wav(path, wave, sr=16000):
    data = np.clip(wave * 32767.0, -32768, 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


def make_dataset(root, n_per_split):
    rng = np.random.default_rng(0)
    labels = [f"/m/w{i}" for i in range(8)]
    files = {}
    for split, n in n_per_split.items():
        entries = []
        for i in range(n):
            path = os.path.join(root, f"{split}{i}.wav")
            cls = i % 8
            t = np.arange(16000) / 16000
            wav = (rng.standard_normal(16000) * 0.05
                   + 0.3 * np.sin(2 * np.pi * (200 + 450 * cls) * t))
            write_wav(path, wav)
            entries.append({"wav": path, "labels": labels[cls]})
        f = os.path.join(root, f"{split}.json")
        with open(f, "w") as fp:
            json.dump({"data": entries}, fp)
        files[split] = f
    csv = os.path.join(root, "labels.csv")
    with open(csv, "w") as fp:
        fp.write("index,mid,display_name\n")
        for i, m in enumerate(labels):
            fp.write(f"{i},{m},word{i}\n")
    files["csv"] = csv
    return files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-type", default="tiny")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", default="2e-3",
                    help="2e-3 suits tiny/depth-4; base/depth-24 wants ~5e-4")
    ap.add_argument("--extra-set", action="append", default=[],
                    help="additional --set recipe overrides, e.g. "
                         "aum_drop_path=0.2 (stochastic-depth e2e drill)")
    ap.add_argument("--smoke", action="store_true",
                    help="compile/run smoke only: 2 epochs, finite-loss "
                         "check, no learning asserts. Round-6 on-chip "
                         "feature smokes used this with --extra-set "
                         "mixup=0.5 noise=True (aug path) and "
                         "flexible_patch_sizes=8,16 (flexi train loop); "
                         "AST ran the full drill: --model-type small "
                         "--depth 2 --extra-set model=ast fstride=16 "
                         "tstride=16 -> acc 0.25, AUC 0.60.")
    args = ap.parse_args()
    if args.smoke:
        args.epochs = min(args.epochs, 2)

    from aum_tpu.run import main as run_main

    root = tempfile.mkdtemp(prefix="aum_synth_")
    files = make_dataset(root, {"train": 512, "valid": 64})
    exp_dir = os.path.join(root, "exp")
    history = run_main([
        "--recipe", "speechcommands/aum-base_scratch",
        "--data-train", files["train"],
        "--data-val", files["valid"],
        "--label-csv", files["csv"],
        "--exp-dir", exp_dir,
        "--num-workers", "4",
        "--set", f"model_type={args.model_type}",
        "--set", f"depth={args.depth}",
        "--set", "n_class=8",
        "--set", f"batch_size={args.batch_size}",
        "--set", f"n_epochs={args.epochs}",
        "--set", f"lr={args.lr}",
        "--set", "noise=False",
        "--set", "mixup=0.0",
    ] + [a for s in args.extra_set for a in ("--set", s)])
    final_acc = history[-1]["acc"]
    print(f"final val acc: {final_acc:.3f} "
          f"(chance = 0.125); artifacts in {exp_dir}")
    assert all(np.isfinite(h["loss"]) for h in history), history
    if args.smoke:
        print("OK (smoke: finite losses, no learning asserts)")
        return
    assert final_acc >= 0.25, "training did not beat chance (acc)"
    assert history[-1]["AUC"] > 0.6, "training did not beat chance (AUC)"
    print("OK")


if __name__ == "__main__":
    main()
