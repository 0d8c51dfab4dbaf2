"""timm DeiT / AST checkpoint porter for the flax ASTModel.

Covers the reference ASTModel's pretrained-init surgery
(/root/reference/src/models/ast_models.py:70-181):
- timm DeiT patch kernel summed over RGB channels to 1 channel
  (ast_models.py:82-86 uses the summed kernel);
- pos-embed retargeted from the (24, 24) 384-image grid (or whatever grid
  the checkpoint encodes) to the AST (f_dim, t_dim) grid by center-crop /
  bilinear interpolation per axis (ast_models.py:89-105);
- encoder blocks mapped (qkv fused weight split into flax MHA's per-head
  query/key/value kernels), final norm kept, classification head replaced
  (the reference's fresh LN+Linear mlp_head, ast_models.py:68).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from aum_tpu.models.ast import ASTConfig, retarget_pos_embed


def port_deit_state_dict(sd: Dict, cfg: ASTConfig,
                         source_grid: tuple | None = None) -> Dict:
    """timm DeiT {key: np.ndarray} -> {"params": ...} for ASTModel(cfg).

    The head (head_norm/head) is left to the fresh init (merge with an init
    tree via aum_tpu.convert.torch_port.merge_with_init).

    `source_grid` is the (f, t) grid the checkpoint's pos embed is laid out
    on; None means a square ImageNet-DeiT grid inferred from the token
    count. Callers that already know (or produced) a non-square layout —
    port_ast_pretrain_state_dict retargets to cfg.patch_grid before calling
    here — must pass it explicitly: a token-count coincidence (e.g. a 24x24
    DeiT checkpoint into a (12,48) audio grid, both 576 tokens) cannot be
    disambiguated from the array alone.
    """
    d = cfg.embed_dim
    h = cfg.num_heads
    dh = d // h

    proj_w = sd["patch_embed.proj.weight"]  # (D, C, ph, pw)
    if proj_w.shape[1] == 3:
        proj_w = proj_w.sum(axis=1, keepdims=True)  # RGB sum (ast_models.py:84)
    kernel = np.transpose(proj_w, (2, 3, 1, 0)).astype(np.float32)

    pos = sd["pos_embed"].astype(np.float32)
    n_prefix = cfg.num_prefix
    n_tok = pos.shape[1] - n_prefix
    tgt = tuple(cfg.patch_grid)
    if source_grid is None:
        # Square ImageNet-DeiT grid (ast_models.py:89-105). Explicit
        # source_grid exists because inference from the token count alone
        # is ambiguous: an already-audio-shaped pos embed (e.g. 2x6 = 12
        # tokens) round(sqrt)s to a wrong square and gets mangled (found
        # by tests/test_drop_path.py::test_ast_pretrain_path_threading).
        side = int(round(n_tok ** 0.5))
        if side * side != n_tok:
            raise ValueError(
                f"pos_embed has {n_tok} tokens — not a square grid; pass "
                "source_grid=(f, t) (or go through "
                "port_ast_pretrain_state_dict's pretrain_grid)")
        source_grid = (side, side)
    if tuple(source_grid) != tgt:
        pos = retarget_pos_embed(pos, tuple(source_grid), tgt, n_prefix)

    params = {
        "patch_proj_weight": kernel,
        "patch_proj_bias": sd["patch_embed.proj.bias"].astype(np.float32),
        "cls_token": sd["cls_token"].astype(np.float32),
        "pos_embed": pos,
        "norm": {"scale": sd["norm.weight"].astype(np.float32),
                 "bias": sd["norm.bias"].astype(np.float32)},
    }
    if cfg.distilled and "dist_token" in sd:
        params["dist_token"] = sd["dist_token"].astype(np.float32)

    for i in range(cfg.depth):
        p = f"blocks.{i}."
        qkv_w = sd[p + "attn.qkv.weight"]  # (3D, D)
        qkv_b = sd[p + "attn.qkv.bias"]
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)

        def head_kernel(w):
            # torch (D_out, D_in) -> flax MHA (D_in, H, Dh)
            return w.T.reshape(d, h, dh).astype(np.float32)

        attn = {
            "query": {"kernel": head_kernel(qw),
                      "bias": qb.reshape(h, dh).astype(np.float32)},
            "key": {"kernel": head_kernel(kw),
                    "bias": kb.reshape(h, dh).astype(np.float32)},
            "value": {"kernel": head_kernel(vw),
                      "bias": vb.reshape(h, dh).astype(np.float32)},
            "out": {"kernel": sd[p + "attn.proj.weight"].T.reshape(
                        h, dh, d).astype(np.float32),
                    "bias": sd[p + "attn.proj.bias"].astype(np.float32)},
        }
        params[f"block_{i}"] = {
            "norm1": {"scale": sd[p + "norm1.weight"].astype(np.float32),
                      "bias": sd[p + "norm1.bias"].astype(np.float32)},
            "attn": attn,
            "norm2": {"scale": sd[p + "norm2.weight"].astype(np.float32),
                      "bias": sd[p + "norm2.bias"].astype(np.float32)},
            "fc1": {"kernel": sd[p + "mlp.fc1.weight"].T.astype(np.float32),
                    "bias": sd[p + "mlp.fc1.bias"].astype(np.float32)},
            "fc2": {"kernel": sd[p + "mlp.fc2.weight"].T.astype(np.float32),
                    "bias": sd[p + "mlp.fc2.bias"].astype(np.float32)},
        }
    return {"params": params}


def export_ast_state_dict(params: Dict, cfg: ASTConfig) -> Dict:
    """Inverse porter: flax ASTModel params -> the reference AST *audio*
    checkpoint layout (nested timm model under `v.`, LN+Linear head under
    `mlp_head.`, ast_models.py:68,114-181), so aum_tpu-trained AST weights
    feed `port_ast_pretrain_state_dict` (exact round-trip, tested) and the
    reference's audioset_pretrain load path."""
    p = params.get("params", params)
    d, h = cfg.embed_dim, cfg.num_heads
    f32 = lambda a: np.asarray(a, np.float32)
    sd: Dict = {
        "v.patch_embed.proj.weight": np.transpose(
            f32(p["patch_proj_weight"]), (3, 2, 0, 1)),
        "v.patch_embed.proj.bias": f32(p["patch_proj_bias"]),
        "v.cls_token": f32(p["cls_token"]),
        "v.pos_embed": f32(p["pos_embed"]),
        "v.norm.weight": f32(p["norm"]["scale"]),
        "v.norm.bias": f32(p["norm"]["bias"]),
    }
    if "dist_token" in p:
        sd["v.dist_token"] = f32(p["dist_token"])
    for i in range(cfg.depth):
        b = p[f"block_{i}"]
        v = f"v.blocks.{i}."
        # flax MHA (D, H, Dh) kernels -> torch rows; qkv re-fused.
        qkv_w = [f32(b["attn"][k]["kernel"]).reshape(d, d).T
                 for k in ("query", "key", "value")]
        qkv_b = [f32(b["attn"][k]["bias"]).reshape(d)
                 for k in ("query", "key", "value")]
        sd[v + "attn.qkv.weight"] = np.concatenate(qkv_w, axis=0)
        sd[v + "attn.qkv.bias"] = np.concatenate(qkv_b, axis=0)
        sd[v + "attn.proj.weight"] = f32(
            b["attn"]["out"]["kernel"]).reshape(d, d).T
        sd[v + "attn.proj.bias"] = f32(b["attn"]["out"]["bias"])
        for nm in ("norm1", "norm2"):
            sd[v + nm + ".weight"] = f32(b[nm]["scale"])
            sd[v + nm + ".bias"] = f32(b[nm]["bias"])
        for nm in ("fc1", "fc2"):
            sd[v + "mlp." + nm + ".weight"] = f32(b[nm]["kernel"]).T
            sd[v + "mlp." + nm + ".bias"] = f32(b[nm]["bias"])
    if "head" in p:
        sd["mlp_head.0.weight"] = f32(p["head_norm"]["scale"])
        sd["mlp_head.0.bias"] = f32(p["head_norm"]["bias"])
        sd["mlp_head.1.weight"] = f32(p["head"]["kernel"]).T
        sd["mlp_head.1.bias"] = f32(p["head"]["bias"])
    return sd


def port_ast_pretrain_state_dict(
    sd: Dict,
    cfg: ASTConfig,
    pretrain_grid: tuple | None = None,
) -> Dict:
    """Port a reference AST *audio* checkpoint (the nested ASTModel layout,
    ast_models.py:114-181: timm model under `v.`, head under `mlp_head.`).

    Strips `module.`, unwraps `v.` to the plain DeiT layout, retargets the
    pos embed from the audio pretrain grid (pass `pretrain_grid=(f,t)`;
    inferred from the pos-embed length assuming the AST 128x1024@10 grid
    (12, 101) when omitted), and ports the mlp_head when the class count
    matches (LN `mlp_head.0` + Linear `mlp_head.1`, ast_models.py:68).
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    deit = {k[len("v."):]: v for k, v in sd.items() if k.startswith("v.")}

    pos = deit["pos_embed"]
    n_prefix = cfg.num_prefix
    n_tok = pos.shape[1] - n_prefix
    if pretrain_grid is None:
        side = round(n_tok ** 0.5)
        if side * side == n_tok:
            pretrain_grid = (side, side)
        elif n_tok == 12 * 101:
            pretrain_grid = (12, 101)  # AST 128x1024 @ stride 10
        else:
            raise ValueError(
                f"cannot infer pretrain grid for {n_tok} tokens; "
                "pass pretrain_grid=(f, t)")
    if tuple(pretrain_grid) != tuple(cfg.patch_grid):
        deit["pos_embed"] = retarget_pos_embed(
            pos.astype(np.float32), tuple(pretrain_grid), cfg.patch_grid,
            n_prefix)

    # pos embed was already retargeted to cfg.patch_grid above.
    ported = port_deit_state_dict(deit, cfg, source_grid=cfg.patch_grid)
    if ("mlp_head.1.weight" in sd
            and sd["mlp_head.1.weight"].shape[0] == cfg.label_dim):
        ported["params"]["head_norm"] = {
            "scale": sd["mlp_head.0.weight"].astype(np.float32),
            "bias": sd["mlp_head.0.bias"].astype(np.float32)}
        ported["params"]["head"] = {
            "kernel": sd["mlp_head.1.weight"].T.astype(np.float32),
            "bias": sd["mlp_head.1.bias"].astype(np.float32)}
    return ported
