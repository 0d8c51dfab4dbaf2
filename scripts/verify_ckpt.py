"""One-command released-checkpoint parity harness.

Flow (VERDICT r1 #6): torch .pth -> aum_tpu.convert porter -> AudioMamba
logits on given wav/flac clips (or a recorded fbank fixture) -> compare
against recorded reference activations / expected logits.

The reference's value proposition is its checkpoint table
(/root/reference/README.md:106-140, e.g. AS-20K mAP 14.05 Fo-Bi base,
SPC-V2 94.44); this script makes checking a released .pth a single command
the moment one is available (no network egress in the build environment, so
no real .pth has flowed through yet — BASELINE.md records that caveat).

Modes:
  record   -- run the ported model on inputs and save logits to an .npz
              golden file (use on a trusted setup to create fixtures).
  verify   -- run the ported model and compare to a golden .npz
              (reference-recorded activations or a prior `record`).
  topk     -- print top-k classes per clip (sanity eyeball, mirrors the
              reference's inference notebook).
For dataset-level metrics (AS-20K mAP within 0.2 of 14.05), use the runner:
  python -m aum_tpu.run --recipe audioset/aum-base_scratch --run-type eval \
      --ckpt ckpt.pth --data-eval eval.json --label-csv class_labels.csv \
      --exp-dir /tmp/eval

Usage:
  python scripts/verify_ckpt.py --ckpt aum-base.pth --model-type base \
      --aum-type Fo-Bi --n-class 527 [--wav a.wav b.flac ...]
      [--golden golden.npz] [--record-to golden.npz] [--label-csv labels.csv]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_model_and_params(args):
    import jax

    from aum_tpu.convert import load_torch_checkpoint, port_aum_state_dict
    from aum_tpu.convert.torch_port import merge_with_init
    from aum_tpu.models import AudioMamba, AudioMambaConfig

    cfg = AudioMambaConfig.from_variant(
        args.model_type, args.aum_type, num_classes=args.n_class,
        spectrogram_size=(args.melbins, args.audio_length))
    model = AudioMamba(cfg)
    x0 = np.zeros((1, args.audio_length, args.melbins), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    sd = load_torch_checkpoint(args.ckpt)
    params = merge_with_init(port_aum_state_dict(sd, cfg), params)
    return model, params, cfg


def featurize_wavs(paths, args):
    """Decode + fbank + normalize exactly like the eval pipeline."""
    import jax
    import jax.numpy as jnp

    from aum_tpu.audio.augment import normalize
    from aum_tpu.audio.fbank import FbankConfig, fbank
    from aum_tpu.data.datasets import AudioConf, load_wav

    conf = AudioConf(num_mel_bins=args.melbins,
                     target_length=args.audio_length,
                     mean=args.dataset_mean, std=args.dataset_std)
    waves, n_frames = [], []
    for p in paths:
        if p.lower().endswith(".wav"):
            w, _sr = load_wav(p)
        else:
            from aum_tpu.data.native import decode_audio

            out, n, _sr = decode_audio(p, conf.target_samples)
            w = out[:min(n, conf.target_samples)]
        w = w - w.mean()
        nf = 0
        if len(w) >= conf.frame_length_samples:
            nf = 1 + ((len(w) - conf.frame_length_samples)
                      // conf.frame_shift_samples)
        nf = min(nf, conf.target_length)
        tgt = conf.target_samples
        w = w[:tgt] if len(w) >= tgt else np.pad(w, (0, tgt - len(w)))
        waves.append(w.astype(np.float32))
        n_frames.append(nf)
    waves = jnp.asarray(np.stack(waves))
    fb = fbank(waves, FbankConfig(num_mel_bins=conf.num_mel_bins))
    mask = (jnp.arange(fb.shape[1])[None, :]
            < jnp.asarray(n_frames)[:, None])
    fb = jnp.where(mask[:, :, None], fb, 0.0)
    return np.asarray(normalize(fb, conf.mean, conf.std))


def reference_logits(args, x):
    """Golden logits from the ACTUAL reference code on CPU torch.

    Imports /root/reference/src/models/mamba_models.py with oracle-stubbed
    fused kernels (aum_tpu/convert/ref_runner.py) and lets the reference's
    own aum_pretrain surgery (mamba_models.py:397-451) load the .pth.
    """
    import torch

    from aum_tpu.convert.ref_runner import import_reference_models

    mm = import_reference_models()
    embed = {"base": 768, "small": 384, "tiny": 192}[args.model_type]
    bimamba = {"Fo-Fo": "none", "Fo-Bi": "v1", "Bi-Bi": "v2"}[args.aum_type]
    model = mm.AudioMamba(
        spectrogram_size=(args.melbins, args.audio_length), depth=24,
        embed_dim=embed, num_classes=args.n_class, bimamba_type=bimamba,
        aum_pretrain=True, aum_pretrain_path=args.ckpt)
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(np.asarray(x))).float().numpy()


def raw_fbank_clips(paths, args):
    """Per-clip RAW Kaldi fbank (no pad/crop, no normalization) — exactly
    the reference's feature step (dataloader.py:120-135: mean-subtract the
    waveform, then torchaudio.compliance.kaldi.fbank with htk_compat=True,
    window 'hanning', dither 0). Used by the --features golden modes."""
    import jax.numpy as jnp

    from aum_tpu.audio.fbank import FbankConfig, fbank
    from aum_tpu.data.datasets import load_wav

    clips = []
    for p in paths:
        if p.lower().endswith(".wav"):
            w, _sr = load_wav(p)
        else:
            from aum_tpu.data.native import decode_audio

            out, n, _sr = decode_audio(p, None)
            w = out[:n]
        w = (w - w.mean()).astype(np.float32)
        fb = fbank(jnp.asarray(w),
                   FbankConfig(num_mel_bins=args.melbins))
        clips.append(np.asarray(fb, dtype=np.float32))
    return clips


def run_feature_mode(args):
    """--features / --features-record-to: frontend-only golden compare
    (VERDICT r3 #6). Record the comparison file on any torchaudio host with:

        import numpy as np, torchaudio
        arrs = {}
        for i, p in enumerate(paths):
            w, sr = torchaudio.load(p); w = w - w.mean()
            arrs[f"clip_{i:03d}"] = torchaudio.compliance.kaldi.fbank(
                w, htk_compat=True, sample_frequency=sr, use_energy=False,
                window_type='hanning', num_mel_bins=128, dither=0.0,
                frame_shift=10).numpy()
        np.savez("features.npz", **arrs)

    then here: verify_ckpt.py --wav <same clips...> --features features.npz
    compares clip-by-clip. A silent frontend mismatch is the most likely
    failure mode on real-checkpoint day; this isolates it from the model.
    """
    assert args.wav, "--features modes need --wav clips"
    clips = raw_fbank_clips(args.wav, args)
    if args.features_record_to:
        np.savez(args.features_record_to,
                 **{f"clip_{i:03d}": c for i, c in enumerate(clips)})
        print(f"recorded {len(clips)} raw fbank clips -> "
              f"{args.features_record_to}")
    rc = 0
    if args.features:
        g = np.load(args.features)
        names = sorted(k for k in g.files if k.startswith("clip_"))
        assert len(names) == len(clips), (names, len(clips))
        for name, ours in zip(names, clips):
            ref = g[name]
            if ref.shape != ours.shape:
                print(f"{name}: SHAPE MISMATCH ours {ours.shape} vs "
                      f"golden {ref.shape}")
                rc = 1
                continue
            err = float(np.abs(ours - ref).max())
            status = "OK" if err <= args.features_atol else "FAIL"
            if status == "FAIL":
                rc = 1
            print(f"{name}: frames={ref.shape[0]} max|Δ|={err:.6f} "
                  f"(atol {args.features_atol}) {status}")
        print("FEATURES PARITY " + ("OK" if rc == 0 else "FAIL"))
    return rc


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt", help="torch .pth checkpoint (not needed for "
                                  "the --features-only modes)")
    p.add_argument("--model-type", default="base")
    p.add_argument("--aum-type", default="Fo-Bi")
    p.add_argument("--n-class", type=int, default=527)
    p.add_argument("--audio-length", type=int, default=1024)
    p.add_argument("--melbins", type=int, default=128)
    p.add_argument("--dataset-mean", type=float, default=-4.2677393)
    p.add_argument("--dataset-std", type=float, default=4.5689974)
    p.add_argument("--wav", nargs="*", help="input clips (wav/flac/m4a)")
    p.add_argument("--fbank-npz",
                   help=".npz with 'x' (B,T,F) precomputed fbanks "
                        "(bypasses the frontend; use for recorded "
                        "reference-activation fixtures)")
    p.add_argument("--golden", help="golden .npz with 'logits' to compare")
    p.add_argument("--record-to", help="save computed logits to this .npz")
    p.add_argument("--ref-parity", action="store_true",
                   help="also run the ACTUAL reference model code on CPU "
                        "torch (oracle-stubbed kernels) on the same inputs "
                        "and compare; with --record-to, the reference "
                        "logits are what gets recorded")
    p.add_argument("--atol", type=float, default=1e-2,
                   help="logit tolerance vs golden (bf16 + TPU numerics)")
    p.add_argument("--label-csv", help="for top-k display names")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--features",
                   help=".npz of per-clip raw torchaudio-Kaldi fbanks "
                        "(clip_000, clip_001, ...) to compare the frontend "
                        "against, clip-by-clip (see run_feature_mode for "
                        "the recording recipe)")
    p.add_argument("--features-record-to",
                   help="save this frontend's raw per-clip fbanks to .npz "
                        "(same schema)")
    p.add_argument("--features-atol", type=float, default=2e-3,
                   help="raw log-mel tolerance (fp32 fft + matmul "
                        "reassociation vs torchaudio)")
    args = p.parse_args(argv)

    import jax

    if args.features or args.features_record_to:
        rc = run_feature_mode(args)
        if not args.ckpt:
            return rc
        if rc:
            return rc

    assert args.ckpt, "--ckpt required (or use the --features-only modes)"
    model, params, cfg = build_model_and_params(args)
    if args.fbank_npz:
        x = np.load(args.fbank_npz)["x"].astype(np.float32)
    else:
        assert args.wav, "need --wav clips or --fbank-npz"
        x = featurize_wavs(args.wav, args)

    logits = np.asarray(
        jax.jit(model.apply)(params, x), dtype=np.float32)
    print(f"logits: shape={logits.shape} "
          f"mean={logits.mean():.4f} std={logits.std():.4f}")

    if args.label_csv:
        from aum_tpu.data.datasets import make_name_dict

        names = make_name_dict(args.label_csv)
        scores = 1.0 / (1.0 + np.exp(-logits))
        for i in range(len(logits)):
            top = np.argsort(-scores[i])[: args.topk]
            print(f"clip {i}: " + ", ".join(
                f"{names[int(k)]}={scores[i, k]:.3f}" for k in top))

    rc = 0
    record = logits
    if args.ref_parity:
        ref = reference_logits(args, x)
        err = np.abs(logits - ref).max()
        print(f"reference-code max|Δlogit| = {err:.5f} (atol {args.atol})")
        if err > args.atol:
            print("REF PARITY FAIL")
            rc = 1
        else:
            print("REF PARITY OK")
        record = ref
    if args.record_to:
        np.savez(args.record_to, logits=record, x=x)
        print(f"recorded golden -> {args.record_to}")
    if args.golden:
        g = np.load(args.golden)["logits"]
        err = np.abs(logits - g).max()
        print(f"golden max|Δlogit| = {err:.5f} (atol {args.atol})")
        if err > args.atol:
            print("PARITY FAIL")
            return 1
        print("PARITY OK")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
