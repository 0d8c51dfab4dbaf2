"""Single-clip inference CLI — the reference inference notebook's
single-sample path (/root/reference/examples/inference/inference.ipynb:
load checkpoint -> kaldi fbank -> normalize -> forward -> top-k labels).

Usage:
    python scripts/infer.py --wav clip.wav --recipe audioset/aum-base_scratch \
        --ckpt <orbax dir or torch .pth> --label-csv labels.csv [--topk 5]

With no arguments it falls back to the sample clips + label CSV bundled with
the reference (examples/inference/data/*.wav, read in place) and a
random-init model — exercising the full decode -> fbank -> normalize ->
forward -> top-k flow even without a released checkpoint (scores are then
meaningless; pass --ckpt for real predictions).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_REF_EXAMPLES = "/root/reference/examples/inference"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav", default=None)
    p.add_argument("--recipe", default="audioset/aum-base_scratch")
    p.add_argument("--ckpt", default=None,
                   help="orbax dir or torch .pth; omitted = random init "
                        "(flow smoke only)")
    p.add_argument("--label-csv", default=None)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--set", action="append", default=[])
    args = p.parse_args()

    if args.wav is None:
        cand = os.path.join(_REF_EXAMPLES, "data", "sample0.wav")
        if not os.path.exists(cand):
            p.error("--wav is required (no bundled sample found)")
        args.wav = cand
    if args.label_csv is None:
        cand = os.path.join(_REF_EXAMPLES, "datafiles",
                            "class_labels_indices.csv")
        args.label_csv = cand if os.path.exists(cand) else None

    import jax
    import jax.numpy as jnp

    from aum_tpu.audio import FbankConfig, fbank, normalize
    from aum_tpu.configs import RECIPES
    from aum_tpu.data.datasets import load_wav, make_name_dict
    from aum_tpu.models import AudioMamba
    from aum_tpu.run import apply_overrides

    cfg = apply_overrides(RECIPES[args.recipe], args.set)
    mcfg = cfg.model_config()
    model = AudioMamba(mcfg)

    wave, sr = load_wav(args.wav)
    wave = wave - wave.mean()
    fb = fbank(jnp.asarray(wave),
               FbankConfig(sample_frequency=sr,
                           num_mel_bins=cfg.melbins))  # (T, M)
    t = fb.shape[0]
    if t < cfg.audio_length:
        fb = jnp.pad(fb, [(0, cfg.audio_length - t), (0, 0)])
    else:
        fb = fb[: cfg.audio_length]
    fb = normalize(fb, cfg.dataset_mean, cfg.dataset_std)

    params = model.init(jax.random.PRNGKey(0), fb[None])
    if args.ckpt is None:
        print("# no --ckpt: random-init model (flow smoke; scores are "
              "meaningless)")
    elif args.ckpt.endswith(".pth"):
        from aum_tpu.convert import load_torch_checkpoint, port_aum_state_dict
        from aum_tpu.convert.torch_port import merge_with_init

        sd = load_torch_checkpoint(args.ckpt)
        params = merge_with_init(port_aum_state_dict(sd, mcfg), params)
    else:
        from aum_tpu.train import Checkpointer
        from aum_tpu.train.loop import TrainState

        ckptr = Checkpointer(args.ckpt)
        state = TrainState(step=0, params=params, opt_state=())
        params = ckptr.restore("best", state).params

    logits = model.apply(params, fb[None])[0]
    scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    names = make_name_dict(args.label_csv) if args.label_csv else {}
    top = np.argsort(-np.asarray(scores))[: args.topk]
    for i in top:
        print(f"{names.get(int(i), i)}: {float(scores[i]):.4f}")


if __name__ == "__main__":
    main()
