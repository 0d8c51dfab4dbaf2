"""LM checkpoint verification: port -> forward -> (golden | reference parity).

The LM-side analogue of scripts/verify_ckpt.py (VERDICT r4 #8). Takes an
HF-format model (a local directory with config.json + pytorch_model.bin, or
a hub id like state-spaces/mamba-130m that transformers resolves from its
cache / the hub), ports it through models/lm.py::from_pretrained_hf
(mirroring the reference's utils/hf.py:10-23 load path), runs a
deterministic-token forward on the jitted flax model, and optionally:

  --ref-parity   build the ACTUAL upstream MambaLMHeadModel
                 (mixer_seq_simple.py:176-264) on CPU torch with
                 oracle-stubbed kernels, strict-load the same weights, and
                 compare logits within --atol;
  --record-to F  save the logits as a golden .npz;
  --golden F     compare against a previously recorded golden.

Run CPU-only:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/verify_lm.py \
      --model state-spaces/mamba-130m --ref-parity
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", required=True,
                   help="HF-format dir (config.json + pytorch_model.bin) "
                        "or hub id")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seq-len", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ref-parity", action="store_true")
    p.add_argument("--record-to", help="save logits to this .npz")
    p.add_argument("--golden", help="compare logits to this .npz")
    p.add_argument("--atol", type=float, default=2e-3,
                   help="fp32-vs-torch tolerance on logits")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aum_tpu.models.lm import MambaLM, from_pretrained_hf

    params, cfg = from_pretrained_hf(args.model)
    print(f"ported: d_model={cfg.d_model} n_layer={cfg.n_layer} "
          f"vocab={cfg.vocab_size} (padded {cfg.padded_vocab})")

    rng = np.random.default_rng(args.seed)
    tokens = rng.integers(0, cfg.vocab_size,
                          (args.batch, args.seq_len)).astype(np.int32)
    model = MambaLM(cfg)
    logits = np.asarray(jax.jit(model.apply)(params, jnp.asarray(tokens)))
    assert np.isfinite(logits).all(), "non-finite logits"
    print(f"logits {logits.shape} mean={logits.mean():.6f} "
          f"std={logits.std():.6f} argmax[0,-1]={int(logits[0, -1].argmax())}")

    if args.record_to:
        np.savez(args.record_to, tokens=tokens, logits=logits)
        print(f"golden recorded: {args.record_to}")
    if args.golden:
        g = np.load(args.golden)
        np.testing.assert_array_equal(g["tokens"], tokens)
        np.testing.assert_allclose(logits, g["logits"], atol=args.atol)
        print("LM GOLDEN OK")

    if args.ref_parity:
        import torch

        from aum_tpu.convert.ref_runner import import_reference_lm

        mix = import_reference_lm()
        from mamba_ssm.models.config_mamba import MambaConfig

        # Resolve the same two files from_pretrained_hf used.
        if os.path.isdir(args.model):
            config_file = os.path.join(args.model, "config.json")
            weights_file = os.path.join(args.model, "pytorch_model.bin")
        else:
            from transformers.utils import CONFIG_NAME, WEIGHTS_NAME
            from transformers.utils.hub import cached_file

            config_file = cached_file(args.model, CONFIG_NAME)
            weights_file = cached_file(args.model, WEIGHTS_NAME)
        raw = json.load(open(config_file))
        ref_cfg = MambaConfig(
            d_model=raw["d_model"], n_layer=raw["n_layer"],
            vocab_size=raw["vocab_size"],
            ssm_cfg=raw.get("ssm_cfg", {}),
            rms_norm=raw.get("rms_norm", True),
            residual_in_fp32=raw.get("residual_in_fp32", True),
            fused_add_norm=raw.get("fused_add_norm", True),
            pad_vocab_size_multiple=raw.get("pad_vocab_size_multiple", 8))
        ref = mix.MambaLMHeadModel(ref_cfg)
        sd = torch.load(weights_file, map_location="cpu")
        ref.load_state_dict(sd)
        ref.eval()
        with torch.no_grad():
            ref_logits = ref(torch.from_numpy(tokens).long()).logits.numpy()
        # Vocab padding: the reference pads lm_head to padded_vocab too, so
        # shapes match; compare the full tensor.
        np.testing.assert_allclose(logits, ref_logits, atol=args.atol)
        print(f"LM PARITY OK (max abs diff "
              f"{np.abs(logits - ref_logits).max():.2e}, atol {args.atol})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
