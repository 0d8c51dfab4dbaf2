"""Export a trained aum_tpu checkpoint to a reference-format torch .pth.

The reverse of scripts/verify_ckpt.py's import direction: takes an orbax
checkpoint directory written by the training loop (train/checkpoints.py,
e.g. <exp_dir>/models/{best,epoch_N}) and writes a .pth state dict with the
exact key set / tensor layout of the reference `AudioMamba.state_dict()`
(/root/reference/src/models/mamba_models.py:193-339), so upstream users can
consume aum_tpu-trained weights unchanged — it strict-loads into a reference
model and feeds its own aum_pretrain load path (mamba_models.py:397-451).
Round-trip + reference-code logit-parity tests: tests/test_torch_port.py::
test_export_port_roundtrip_identity, tests/test_ref_parity.py::
test_export_to_reference_strict_load_and_logit_parity.

Usage:
  python scripts/export_torch_ckpt.py --orbax exp/models --name best \
      --model-type base --aum-type Fo-Bi --n-class 527 --out aum-base.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--orbax", required=True,
                   help="orbax checkpoint dir (contains best/, epoch_N/)")
    p.add_argument("--name", default="best", help="best or epoch_<N>")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--model-type", default="base",
                   choices=["base", "small", "tiny"])
    p.add_argument("--aum-type", default="Fo-Bi",
                   choices=["Fo-Fo", "Fo-Bi", "Bi-Bi"])
    p.add_argument("--n-class", type=int, required=True)
    p.add_argument("--audio-length", type=int, default=1024)
    p.add_argument("--melbins", type=int, default=128)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    from aum_tpu.convert.torch_port import save_reference_checkpoint
    from aum_tpu.models import AudioMambaConfig

    cfg = AudioMambaConfig.from_variant(
        args.model_type, args.aum_type, num_classes=args.n_class,
        spectrogram_size=(args.melbins, args.audio_length))
    tree = ocp.StandardCheckpointer().restore(
        os.path.join(os.path.abspath(args.orbax), args.name))
    params = tree["params"] if "params" in tree else tree
    save_reference_checkpoint(params, cfg, args.out)
    n = sum(int(v.size) for v in jax.tree.leaves(params))
    print(f"exported {args.name} ({n/1e6:.1f}M params) -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
