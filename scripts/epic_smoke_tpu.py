"""On-chip EPIC-SOUNDS smoke: the EPIC device frontend on real TPU.

Everything EPIC-specific had only run under the CPU suite until round 6:
the librosa-compatible centered STFT (rfft n_fft=2048 on the TPU FFT path),
the sparse-image-warp SpecAugment (polyharmonic-spline lstsq solve + dense
bilinear warp, audio/spec_warp.py), edge-pad masking, and the CE train loop
(reference epic runner, /root/reference/src/epic_sounds/). This script
drives the REAL `aum_tpu.run` EPIC branch end-to-end on-chip with a
synthetic HDF5 + annotations fixture (same construction as
tests/test_epic.py::epic_h5, more records), then a test-split ensemble
eval.

Run (TPU): python scripts/epic_smoke_tpu.py
Round-6 result (2026-08-21, v5e): see docs/ROUND6.md.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fixture(root: str, n_videos: int = 4, n_records: int = 16,
                  num_classes: int = 5, sr: int = 24000):
    """sr MUST match the pipeline's EpicAudioConfig.sampling_rate (24000 —
    the reference's SAMPLING_RATE): EpicSoundsRecord converts the
    annotation timestamps to sample offsets at that rate, so a fixture
    written at another rate misaligns every segment. Records cycle through
    three segment kinds: 0.4 s (shorter than the smoke's 128-frame target
    at 5 ms hop, so the edge-pad path actually pads), 2 s (sub-clip
    whole-segment path, frame-full), and 11 s (the random/uniform-window
    path) — every _extract_sound_feature branch AND the edge-pad masking
    run on-chip."""
    import h5py
    import pandas as pd

    rng = np.random.default_rng(0)
    with h5py.File(os.path.join(root, "audio.hdf5"), "w") as f:
        for v in range(n_videos):
            # 14 s of class-tinted tone+noise so CE has signal to fit
            n = int(sr * 14.0)
            t = np.arange(n) / sr
            freq = 200.0 * (1 + (v % num_classes))
            wav = (0.4 * np.sin(2 * np.pi * freq * t)
                   + 0.1 * rng.standard_normal(n))
            f.create_dataset(f"video{v}", data=wav.astype(np.float32))
    rows = []
    for r in range(n_records):
        v = r % n_videos
        start = 0.2 + 0.1 * (r // n_videos)
        dur = (0.4, 2.0, 11.0)[r % 3]
        rows.append({
            "participant_id": "P1", "video_id": f"video{v}",
            "annotation_id": f"a{r}",
            "start_timestamp": f"00:00:{start:06.3f}",
            "stop_timestamp": f"00:00:{start + dur:06.3f}",
            "class_id": v % num_classes,
        })
    pd.DataFrame(rows).to_pickle(os.path.join(root, "ann.pkl"))
    return (os.path.join(root, "ann.pkl"),
            os.path.join(root, "audio.hdf5"))


def main():
    from aum_tpu.run import main as run_main

    root = tempfile.mkdtemp(prefix="aum_epic_smoke_")
    ann, h5 = build_fixture(root)
    exp_dir = os.path.join(root, "exp")
    common = [
        "--recipe", "epic_sounds/aum-base_scratch",
        "--epic-hdf5", h5,
        "--epic-annotations-train", ann,
        "--epic-annotations-val", ann,
        "--num-workers", "2",
        "--set", "depth=4", "--set", "model_type=tiny",
        "--set", "n_class=5", "--set", "batch_size=8",
        "--set", "dtype=bfloat16",
        "--set", "audio_length=128", "--set", "timem=8", "--set", "freqm=8",
    ]
    history = run_main(common + ["--exp-dir", exp_dir,
                                 "--set", "n_epochs=3"])
    assert len(history) == 3, history
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses), losses
    print("train epochs:", [(h["epoch"], round(h["loss"], 4),
                             round(h.get("main", float("nan")), 4))
                            for h in history])

    # test-split ensemble eval on the trained checkpoint
    stats = run_main(common + [
        "--exp-dir", os.path.join(root, "exp_eval"),
        "--run-type", "eval",
        "--epic-annotations-test", ann,
        "--ckpt", os.path.join(exp_dir, "models"),
    ])
    print("ensemble eval:", stats)
    print("EPIC on-chip smoke OK")


if __name__ == "__main__":
    main()
