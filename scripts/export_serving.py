"""Export a trained AuM model into an AOT serving bundle (jax.export).

The TPU-native replacement for the reference's in-process deployment
notebook (/root/reference/examples/inference/inference.ipynb): instead of
rebuilding the model from Python at serve time, compile the forward (and
optionally the whole wav -> fbank -> logits frontend) ahead of time into a
portable StableHLO bundle a serving host loads and calls.

Usage:
    python scripts/export_serving.py --recipe audioset/aum-base_scratch \
        --ckpt <orbax dir or torch .pth> --label-csv labels.csv \
        --out aum-base.aum.zip [--batch-sizes 1,8,64] [--platforms tpu] \
        [--include-frontend] [--set k=v ...]

Smoke (no checkpoint; random init, cpu platform):
    python scripts/export_serving.py --out /tmp/b.zip --platforms cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--recipe", default="audioset/aum-base_scratch")
    p.add_argument("--ckpt", default=None,
                   help="orbax dir or torch .pth; omitted = random init "
                        "(flow smoke only)")
    p.add_argument("--label-csv", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-sizes", default="1,8")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu or tpu,cpu; default = "
                        "current process platform")
    p.add_argument("--include-frontend", action="store_true",
                   help="export wav -> fbank -> logits as one graph "
                        "(fixed-length clips of --clip-secs)")
    p.add_argument("--clip-secs", type=float, default=10.0)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--use-kernel", default="auto", choices=["auto", "0", "1"],
                   help="auto = Pallas kernels (interpret off-TPU). Pass 0 "
                        "for CPU-platform exports: interpret-mode tracing "
                        "of a depth-24 model is impractically slow")
    p.add_argument("--n-data", type=int, default=0,
                   help="multi-chip export: data-axis size (0 = single "
                        "chip). Requires --use-kernel 0 (GSPMD path).")
    p.add_argument("--n-model", type=int, default=1,
                   help="tensor-parallel export: model-axis size (params "
                        "sharded d_inner over 'model'; see serving.py)")
    p.add_argument("--weight-quant", default=None, choices=["int8"],
                   help="weight-only quantization of the matmul weights "
                        "(dequantized in-graph; ~4x smaller params)")
    p.add_argument("--set", action="append", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aum_tpu.configs import RECIPES
    from aum_tpu.models import AudioMamba
    from aum_tpu.run import apply_overrides
    from aum_tpu.serving import save_bundle

    cfg = apply_overrides(RECIPES[args.recipe], args.set)
    mcfg = cfg.model_config()
    use_kernel = None if args.use_kernel == "auto" else args.use_kernel == "1"
    model = AudioMamba(mcfg, use_kernel=use_kernel)
    x = jnp.zeros((1, cfg.audio_length, cfg.melbins), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    if args.ckpt is None:
        print("# no --ckpt: exporting a RANDOM-INIT model (smoke only)")
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

    labels = None
    if args.label_csv:
        from aum_tpu.data.datasets import make_name_dict

        names = make_name_dict(args.label_csv)
        labels = [names.get(i, str(i)) for i in range(cfg.n_class)]

    mesh = None
    if args.n_data or args.n_model > 1:
        from aum_tpu.parallel import make_mesh

        n_model = max(args.n_model, 1)
        mesh = make_mesh(n_data=args.n_data or None, n_model=n_model)

    save_bundle(
        args.out, model, params,
        audio_length=cfg.audio_length, melbins=cfg.melbins,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        mean=cfg.dataset_mean, std=cfg.dataset_std, labels=labels,
        platforms=(args.platforms.split(",") if args.platforms else None),
        include_frontend=args.include_frontend,
        sample_rate=args.sample_rate,
        wav_samples=(int(args.clip_secs * args.sample_rate)
                     if args.include_frontend else None),
        mesh=mesh, model_axis="model" if args.n_model > 1 else None,
        weight_quant=args.weight_quant,
        extra_meta={"recipe": args.recipe, "variant": cfg.model_type,
                    "aum_type": cfg.aum_type})
    sz = os.path.getsize(args.out)
    print(f"wrote {args.out} ({sz / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
