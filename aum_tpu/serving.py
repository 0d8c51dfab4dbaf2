"""AOT export + serving bundles (`jax.export` / StableHLO).

The reference's deployment story is an in-process notebook
(/root/reference/examples/inference/inference.ipynb: rebuild the torch
model, load a .pth, kaldi fbank, forward). TPU-native serving wants an
ahead-of-time artifact instead: `jax.export` serializes the jitted forward
(StableHLO + calling convention, Pallas scan kernels embedded as Mosaic
custom calls) so a serving host can execute the model without the Python
model stack — load bytes, call.

Bundle layout (single zip file):

  manifest.json    metadata: input layout, norm stats, label names,
                   exported batch sizes, platforms, frontend flag
  graph_b{N}.shlo  jax.export serialization of the forward at batch N
  params.npz       flax params, '/'-joined keys (kept OUT of the graph:
                   baking ~92M weights in as StableHLO constants bloats
                   the artifact and defeats weight hot-swap)

``include_frontend=True`` exports the whole serving graph
wav -> mean-subtract -> kaldi fbank -> pad/crop -> normalize -> logits as
ONE XLA program (the dataloader.py:94-147 + notebook flow, fused on
device); otherwise the graph takes (B, T_frames, n_mels) log-mel input.

Batch handling at serve time: requests are padded up to the smallest
exported batch size that fits; oversized requests run in chunks of the
largest exported size. Exported sizes are static by design — the Pallas
scan grid is specialized per shape, and serving on fixed shapes is the
XLA-native deployment model (no recompiles, no dynamic-shape fallbacks).
"""

from __future__ import annotations

import io
import json
import zipfile
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

__all__ = ["export_bundle", "save_bundle", "load_bundle", "ServingModel",
           "make_http_server", "quantize_weights_int8", "dequantize_params"]

_MANIFEST = "manifest.json"
_PARAMS = "params.npz"

# Weight-only int8 quantization targets: the AudioMamba matmul weights
# (mixer projections + classifier head) — where the parameter bytes are.
# Everything precision-sensitive or tiny stays float: the patch-embed conv
# (first layer), A_log/D (SSM dynamics), depthwise conv1d (k=4), biases,
# norms, cls/pos embeddings.
_INT8_LEAF_NAMES = frozenset({
    "in_proj_x_weight", "in_proj_z_weight", "out_proj_weight",
    "x_proj_weight", "x_proj_b_weight", "dt_proj_weight",
    "dt_proj_b_weight", "head_weight",
})
_QUANT_KEYS = ("int8", "scale")


def _int8_scale_axes(ndim: int) -> tuple:
    """Reduction axes for per-output-channel scales.

    (in, out) weights reduce the input dim; stacked (layers, in, out)
    mixer weights keep per-layer scales; conv kernels (kh, kw, cin, cout)
    reduce everything but cout. Any granularity is numerically valid as
    long as dequantization broadcasts the same shape — finer is better.
    """
    return (1,) if ndim == 3 else tuple(range(ndim - 1))


def quantize_weights_int8(params: Any) -> Any:
    """Weight-only int8 quantization of the serving params (per-channel).

    Each targeted leaf w becomes {"int8": round(w/s), "scale": s} with
    s = amax|w| / 127 per output channel — a ~4x smaller params payload
    and ~halved weight HBM reads vs bf16 at serve time. Dequantization
    (`dequantize_params`) happens IN-GRAPH in the exported StableHLO, so a
    quantized bundle is self-contained: load_bundle/ServingModel need no
    changes and no model code. The reference has no serving/quantization
    story; this follows standard weight-only PTQ practice.
    """

    def leaf(path, w):
        name = getattr(path[-1], "key", None)
        if name not in _INT8_LEAF_NAMES or jnp.ndim(w) < 2:
            return w
        w = np.asarray(w, np.float32)
        s = np.max(np.abs(w), axis=_int8_scale_axes(w.ndim),
                   keepdims=True) / 127.0
        s = np.where(s == 0.0, 1.0, s).astype(np.float32)
        q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
        return {"int8": q, "scale": s}

    return jax.tree_util.tree_map_with_path(leaf, params)


def _is_quant_leaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == set(_QUANT_KEYS)


def dequantize_params(qparams: Any, dtype=jnp.float32) -> Any:
    """Invert quantize_weights_int8 (jit/export-traceable)."""

    def leaf(x):
        if _is_quant_leaf(x):
            return x["int8"].astype(dtype) * x["scale"].astype(dtype)
        return x

    return jax.tree.map(leaf, qparams, is_leaf=_is_quant_leaf)


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return out


def _forward_fn(model, *, include_frontend: bool, audio_length: int,
                melbins: int, mean: float, std: float, sample_rate: int):
    """Build the (params, x) -> logits function to export."""
    if not include_frontend:
        def fwd(params, x):
            return model.apply(params, x)

        return fwd

    from aum_tpu.audio import FbankConfig, fbank, normalize

    fcfg = FbankConfig(sample_frequency=sample_rate, num_mel_bins=melbins)

    def fwd(params, wav):
        # (B, S) waveform -> logits; dataloader.py:98-147 semantics:
        # per-clip mean subtract, kaldi fbank, zero-pad / crop to
        # audio_length frames, (x - mean) / (2 * std) normalize.
        wav = wav - jnp.mean(wav, axis=-1, keepdims=True)
        fb = fbank(wav, fcfg)  # (B, T, M)
        t = fb.shape[1]
        if t < audio_length:
            fb = jnp.pad(fb, [(0, 0), (0, audio_length - t), (0, 0)])
        else:
            fb = fb[:, :audio_length]
        fb = normalize(fb, mean, std)
        return model.apply(params, fb)

    return fwd


def export_bundle(
    model,
    params,
    *,
    audio_length: int,
    melbins: int,
    batch_sizes: Sequence[int] = (1, 8),
    mean: float = 0.0,
    std: float = 0.5,
    labels: Optional[Sequence[str]] = None,
    platforms: Optional[Sequence[str]] = None,
    include_frontend: bool = False,
    sample_rate: int = 16000,
    wav_samples: Optional[int] = None,
    mesh=None,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    weight_quant: Optional[str] = None,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> bytes:
    """Serialize `model.apply(params, .)` into a serving bundle (zip bytes).

    platforms: lowering platforms for jax.export (e.g. ("tpu",)); None uses
    the default platform of the current process.

    mesh: a `jax.sharding.Mesh` for multi-chip serving — the batch is
    sharded over `data_axis`, and GSPMD partitions the graph (the exported
    artifact then requires the same device count at load time;
    `ServingModel.predict` must be called under that mesh). Batch sizes
    must be divisible by the data-axis size. NOTE: multi-chip export
    requires the model's GSPMD jnp scan path (build the model with
    ``use_kernel=False``): the Pallas kernels' custom_partitioning rules
    are python callbacks, which jax.export cannot serialize
    (jax _export.py:1088 "host_callbacks"). Single-chip exports embed the
    Pallas kernels as Mosaic custom calls and are the fast path.

    model_axis: tensor-parallel serving. When set (and the mesh has that
    axis with size > 1), params are sharded with the training TP layout —
    the Mamba mixers' d_inner dimension over `model_axis`
    (aum_tpu/parallel/mesh.py::param_partition_specs) — instead of
    replicated, halving (at TP=2) the per-chip weight footprint; the two
    small psums per mixer ride ICI. The layout is recorded in the manifest
    and re-applied at load time.

    weight_quant: "int8" exports with weight-only per-channel int8
    quantization of the matmul weights (quantize_weights_int8): ~4x
    smaller params payload, ~halved weight HBM reads; dequantization is
    part of the exported graph, so loading/serving is unchanged. Not
    combinable with model_axis (TP) yet.
    """
    if include_frontend and wav_samples is None:
        raise ValueError("include_frontend=True requires wav_samples")
    if weight_quant not in (None, "int8"):
        raise ValueError(f"unknown weight_quant {weight_quant!r}")
    fwd = _forward_fn(model, include_frontend=include_frontend,
                      audio_length=audio_length, melbins=melbins,
                      mean=mean, std=std, sample_rate=sample_rate)

    tp = bool(mesh is not None and model_axis is not None
              and mesh.shape.get(model_axis, 1) > 1)
    if weight_quant == "int8":
        # Params become the quantized tree and the exported graph carries
        # the dequantization (weight-only PTQ; see quantize_weights_int8).
        if tp:
            raise ValueError("weight_quant is not supported together with "
                             "model_axis (TP) yet: the TP partition specs "
                             "are defined on the float param tree")
        params = quantize_weights_int8(params)
        inner_fwd = fwd

        def fwd(qparams, x):  # noqa: F811 — deliberate wrap
            return inner_fwd(dequantize_params(qparams), x)

    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        x_sh = NamedSharding(mesh, PartitionSpec(data_axis))
        if tp:
            from aum_tpu.parallel.mesh import param_partition_specs

            specs = param_partition_specs(params, model_axis)
            p_sh = jax.tree.map(
                lambda _, s: NamedSharding(mesh, s), p_spec, specs)
        else:
            p_sh = jax.tree.map(
                lambda _: NamedSharding(mesh, PartitionSpec()), p_spec)
        jfwd = jax.jit(fwd, in_shardings=(p_sh, x_sh))
    else:
        jfwd = jax.jit(fwd)

    plats = list(platforms) if platforms is not None else None
    graphs: Dict[int, bytes] = {}
    for bsz in sorted(set(int(b) for b in batch_sizes)):
        if mesh is not None and bsz % mesh.shape[data_axis]:
            raise ValueError(
                f"batch size {bsz} not divisible by mesh axis "
                f"'{data_axis}' = {mesh.shape[data_axis]}")
        if include_frontend:
            x_spec = jax.ShapeDtypeStruct((bsz, wav_samples), jnp.float32)
        else:
            x_spec = jax.ShapeDtypeStruct((bsz, audio_length, melbins),
                                          jnp.float32)
        exp = jax_export.export(jfwd, platforms=plats)(p_spec, x_spec)
        graphs[bsz] = exp.serialize()

    manifest = {
        "format_version": 1,
        "batch_sizes": sorted(graphs),
        "audio_length": audio_length,
        "melbins": melbins,
        "mean": mean,
        "std": std,
        "sample_rate": sample_rate,
        "include_frontend": include_frontend,
        "wav_samples": wav_samples,
        "platforms": plats,
        "labels": list(labels) if labels is not None else None,
        "n_devices": int(np.prod(list(mesh.shape.values())))
                     if mesh is not None else 1,
        "data_axis": data_axis if mesh is not None else None,
        # Full mesh shape (ordered axis -> size) + the TP axis, so load_bundle
        # can rebuild the exact mesh and re-apply the param layout.
        "mesh_shape": ({k: int(v) for k, v in mesh.shape.items()}
                       if mesh is not None else None),
        "model_axis": model_axis if tp else None,
        "weight_quant": weight_quant,
    }
    if extra_meta:
        manifest.update(extra_meta)

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MANIFEST, json.dumps(manifest, indent=1))
        pbuf = io.BytesIO()
        np.savez(pbuf, **_flatten(params))
        zf.writestr(_PARAMS, pbuf.getvalue())
        for bsz, blob in graphs.items():
            zf.writestr(f"graph_b{bsz}.shlo", blob)
    return buf.getvalue()


def save_bundle(path: str, *args, **kwargs) -> None:
    with open(path, "wb") as f:
        f.write(export_bundle(*args, **kwargs))


@dataclass
class ServingModel:
    """A loaded serving bundle: deserialized graphs + params, no model code.

    `predict(x)` pads the request batch up to the smallest exported size
    that fits (oversized requests run in chunks of the largest size) and
    returns logits for exactly the requested rows.
    """

    manifest: Dict[str, Any]
    _graphs: Dict[int, Any] = field(repr=False)
    _params: Dict[str, Any] = field(repr=False)
    _params_placed: bool = field(default=False, repr=False)

    @property
    def labels(self) -> Optional[List[str]]:
        return self.manifest.get("labels")

    @property
    def batch_sizes(self) -> List[int]:
        return list(self.manifest["batch_sizes"])

    def _mesh(self):
        """(Re)build the serving mesh for a multi-device bundle."""
        from jax.sharding import Mesh

        n = int(self.manifest.get("n_devices") or 1)
        devs = jax.devices()
        if len(devs) < n:
            raise RuntimeError(
                f"bundle exported for {n} devices; {len(devs)} available")
        shape = self.manifest.get("mesh_shape")
        if shape:  # ordered axis -> size (TP bundles need the full mesh)
            return Mesh(
                np.array(devs[:n]).reshape([int(v) for v in shape.values()]),
                tuple(shape.keys()))
        return Mesh(np.array(devs[:n]), (self.manifest["data_axis"],))

    def _run(self, bsz: int, x: jax.Array) -> jax.Array:
        exp = self._graphs[bsz]
        if not callable(exp):  # lazily deserialize + jit once per size
            exp = jax.jit(jax_export.deserialize(exp).call)
            self._graphs[bsz] = exp
        if int(self.manifest.get("n_devices") or 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            mesh = self._mesh()
            axis = self.manifest["data_axis"]
            if not self._params_placed:
                tp_axis = self.manifest.get("model_axis")
                if tp_axis:
                    # Re-apply the recorded TP layout (d_inner over the
                    # model axis). Needs only the param-tree paths, not the
                    # model code — the bundle stays model-stack-free.
                    from aum_tpu.parallel.mesh import param_partition_specs

                    specs = param_partition_specs(self._params, tp_axis)
                    self._params = jax.tree.map(
                        lambda p, s: jax.device_put(
                            p, NamedSharding(mesh, s)),
                        self._params, specs)
                else:
                    self._params = jax.device_put(
                        self._params, NamedSharding(mesh, PartitionSpec()))
                self._params_placed = True
            x = jax.device_put(
                x, NamedSharding(mesh, PartitionSpec(axis)))
        return exp(self._params, x)

    def predict(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.float32)
        b = x.shape[0]
        sizes = self.batch_sizes
        fit = [s for s in sizes if s >= b]
        if fit:
            bsz = fit[0]
            pad = bsz - b
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            out = self._run(bsz, x)
            # Skip the slice when nothing was padded: x[:b] of a full-size
            # batch still dispatches a lax.slice per call (measured in the
            # bench_serving sequential-dispatch premium, docs/SERVING.md).
            return out[:b] if pad else out
        big = sizes[-1]
        outs = [self.predict(x[i:i + big]) for i in range(0, b, big)]
        return jnp.concatenate(outs)

    def predict_scores(self, x) -> jax.Array:
        """Sigmoid scores (the notebook's readout, inference.ipynb)."""
        return jax.nn.sigmoid(self.predict(x).astype(jnp.float32))


def make_http_server(sm: ServingModel, host: str = "127.0.0.1",
                     port: int = 8000):
    """A minimal stdlib HTTP front for a ServingModel.

    Endpoints:
      GET  /healthz  -> {"ok": true, "batch_sizes": [...], ...}
      POST /predict  -> body {"instances": [[...], ...]} (nested lists,
                        shape (B, T, M) features or (B, S) waveforms per
                        the bundle's include_frontend flag); returns
                        {"scores": [[...], ...]} sigmoid scores, plus
                        "topk": [[{"label", "score"}, ...], ...] when the
                        bundle carries label names.

    Returns an http.server.ThreadingHTTPServer (call .serve_forever(), or
    run it from a thread; a lock serializes predict calls). Deliberately
    dependency-free — a production deployment would put this behind a real
    frontend, but the artifact + this loop IS a complete serving host.
    """
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "not found"})
            m = sm.manifest
            self._reply(200, {
                "ok": True, "batch_sizes": m["batch_sizes"],
                "include_frontend": m["include_frontend"],
                "audio_length": m["audio_length"], "melbins": m["melbins"],
                "n_labels": len(sm.labels) if sm.labels else 0,
            })

        def do_POST(self):
            if self.path != "/predict":
                return self._reply(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                x = np.asarray(req["instances"], np.float32)
                topk = int(req.get("topk", 0))
                with lock:
                    scores = np.asarray(sm.predict_scores(x))
            except Exception as e:  # noqa: BLE001 — surfaced to the client
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            out: Dict[str, Any] = {"scores": scores.tolist()}
            if topk and sm.labels:
                idx = np.argsort(-scores, axis=-1)[:, :topk]
                out["topk"] = [
                    [{"label": sm.labels[int(i)], "score": float(s[int(i)])}
                     for i in row]
                    for row, s in zip(idx, scores)]
            self._reply(200, out)

    return ThreadingHTTPServer((host, port), Handler)


def load_bundle(src) -> ServingModel:
    """Load a bundle from a path or bytes. Graphs deserialize lazily."""
    if isinstance(src, (bytes, bytearray)):
        data = src
    else:
        with open(src, "rb") as f:
            data = f.read()
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        manifest = json.loads(zf.read(_MANIFEST))
        flat = dict(np.load(io.BytesIO(zf.read(_PARAMS))))
        graphs: Dict[int, Any] = {
            int(b): zf.read(f"graph_b{b}.shlo")
            for b in manifest["batch_sizes"]
        }
    return ServingModel(manifest=manifest, _graphs=graphs,
                        _params=_unflatten(flat))
