"""Serving-bundle (jax.export AOT) tests — CPU platform roundtrips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aum_tpu.models import AudioMamba, AudioMambaConfig
from aum_tpu.serving import export_bundle, load_bundle


@pytest.fixture(scope="module")
def tiny_model():
    cfg = AudioMambaConfig(depth=2, embed_dim=64, spectrogram_size=(32, 64),
                           patch_size=(16, 16), num_classes=10)
    model = AudioMamba(cfg)
    x = jnp.zeros((1, 64, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return cfg, model, params


def test_roundtrip_matches_apply(tiny_model):
    cfg, model, params = tiny_model
    blob = export_bundle(
        model, params, audio_length=64, melbins=32, batch_sizes=(2,),
        labels=["l%d" % i for i in range(10)], platforms=("cpu",))
    sm = load_bundle(blob)
    assert sm.batch_sizes == [2]
    assert sm.labels[3] == "l3"

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
    got = np.asarray(sm.predict(x))
    want = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_predict_pads_and_chunks(tiny_model):
    cfg, model, params = tiny_model
    blob = export_bundle(model, params, audio_length=64, melbins=32,
                         batch_sizes=(2, 4), platforms=("cpu",))
    sm = load_bundle(blob)

    x = jax.random.normal(jax.random.PRNGKey(2), (3, 64, 32))
    got = np.asarray(sm.predict(x))  # pads 3 -> 4
    want = np.asarray(model.apply(params, x))
    assert got.shape == (3, 10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    x = jax.random.normal(jax.random.PRNGKey(3), (9, 64, 32))
    got = np.asarray(sm.predict(x))  # chunks 4 + 4 + pad(1 -> 2)
    want = np.asarray(model.apply(params, x))
    assert got.shape == (9, 10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_frontend_graph_matches_manual_pipeline(tiny_model):
    from aum_tpu.audio import FbankConfig, fbank, normalize

    cfg, model, params = tiny_model
    sr, secs = 16000, 0.75
    nsamp = int(sr * secs)
    blob = export_bundle(
        model, params, audio_length=64, melbins=32, batch_sizes=(2,),
        mean=-4.27, std=4.57, include_frontend=True, sample_rate=sr,
        wav_samples=nsamp, platforms=("cpu",))
    sm = load_bundle(blob)
    assert sm.manifest["include_frontend"] is True

    wav = jax.random.normal(jax.random.PRNGKey(4), (2, nsamp)) * 0.1
    got = np.asarray(sm.predict(wav))

    w = wav - jnp.mean(wav, axis=-1, keepdims=True)
    fb = fbank(w, FbankConfig(sample_frequency=sr, num_mel_bins=32))
    t = fb.shape[1]
    fb = (jnp.pad(fb, [(0, 0), (0, 64 - t), (0, 0)]) if t < 64
          else fb[:, :64])
    fb = normalize(fb, -4.27, 4.57)
    want = np.asarray(model.apply(params, fb))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_export_roundtrip(tiny_model):
    """Multi-chip serving: batch sharded over an 8-device 'data' mesh at
    export time; the loaded graph runs under the same device count and
    matches the unsharded forward."""
    from jax.sharding import Mesh

    cfg, model, params = tiny_model
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))
    # Multi-chip export rides the GSPMD jnp scan path: the Pallas kernels'
    # custom_partitioning rules are python callbacks, which jax.export
    # cannot serialize yet (jax _export.py:1088) — see export_bundle docs.
    model = AudioMamba(cfg, use_kernel=False)
    blob = export_bundle(model, params, audio_length=64, melbins=32,
                         batch_sizes=(8,), platforms=("cpu",), mesh=mesh)
    sm = load_bundle(blob)
    assert sm.manifest["n_devices"] == 8

    x = jax.random.normal(jax.random.PRNGKey(6), (8, 64, 32))
    got = np.asarray(sm.predict(x))
    want = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tp_sharded_export_roundtrip(tiny_model):
    """TP serving (VERDICT r2 #9): params exported model-sharded (d_inner
    over a 2-way 'model' axis, 4-way 'data') on the 8-device CPU mesh; the
    loaded bundle re-applies the recorded layout and matches the unsharded
    forward."""
    from jax.sharding import NamedSharding

    from aum_tpu.parallel.mesh import make_mesh, param_partition_specs

    cfg, model, params = tiny_model
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(n_data=4, n_model=2, devices=devs[:8])
    model = AudioMamba(cfg, use_kernel=False)  # GSPMD path (see above)
    blob = export_bundle(model, params, audio_length=64, melbins=32,
                         batch_sizes=(4, 8), platforms=("cpu",), mesh=mesh,
                         model_axis="model")
    sm = load_bundle(blob)
    assert sm.manifest["n_devices"] == 8
    assert sm.manifest["model_axis"] == "model"
    assert sm.manifest["mesh_shape"] == {"data": 4, "model": 2}

    x = jax.random.normal(jax.random.PRNGKey(8), (8, 64, 32))
    got = np.asarray(sm.predict(x))
    want = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # The placed params actually carry the TP layout (not replicated).
    specs = param_partition_specs(sm._params, "model")
    smesh = sm._mesh()
    sharded = jax.tree.leaves(jax.tree.map(
        lambda p, s: p.sharding == NamedSharding(smesh, s),
        sm._params, specs))
    assert all(sharded)

    # Padded request through the TP graph (3 -> 4).
    got = np.asarray(sm.predict(x[:3]))
    np.testing.assert_allclose(got, want[:3], rtol=1e-5, atol=1e-5)


def test_http_server_roundtrip(tiny_model):
    import json
    import threading
    import urllib.request

    from aum_tpu.serving import make_http_server

    cfg, model, params = tiny_model
    blob = export_bundle(model, params, audio_length=64, melbins=32,
                         batch_sizes=(2,),
                         labels=["l%d" % i for i in range(10)],
                         platforms=("cpu",))
    sm = load_bundle(blob)
    srv = make_http_server(sm, "127.0.0.1", 0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["batch_sizes"] == [2]

        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(7), (2, 64, 32)))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"instances": x.tolist(), "topk": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        want = np.asarray(sm.predict_scores(x))
        np.testing.assert_allclose(np.asarray(out["scores"]), want,
                                   rtol=1e-5, atol=1e-6)
        assert len(out["topk"][0]) == 3
        assert out["topk"][0][0]["label"].startswith("l")

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not json",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_scores_are_sigmoid(tiny_model):
    cfg, model, params = tiny_model
    blob = export_bundle(model, params, audio_length=64, melbins=32,
                         batch_sizes=(1,), platforms=("cpu",))
    sm = load_bundle(blob)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 32))
    s = np.asarray(sm.predict_scores(x))
    logits = np.asarray(sm.predict(x), np.float32)
    np.testing.assert_allclose(s, 1.0 / (1.0 + np.exp(-logits)), rtol=1e-6)


def test_int8_weight_quant_roundtrip(tiny_model):
    """Weight-only int8 export: the bundle carries int8 matmul weights +
    per-channel scales, dequantizes IN-GRAPH, loads through the unchanged
    ServingModel, and tracks the float logits within quantization noise."""
    import io
    import json
    import zipfile

    cfg, model, params = tiny_model
    blob_f = export_bundle(model, params, audio_length=64, melbins=32,
                           batch_sizes=(2,), platforms=("cpu",))
    blob_q = export_bundle(model, params, audio_length=64, melbins=32,
                           batch_sizes=(2,), platforms=("cpu",),
                           weight_quant="int8")

    with zipfile.ZipFile(io.BytesIO(blob_q)) as zf:
        manifest = json.loads(zf.read("manifest.json"))
        pz = np.load(io.BytesIO(zf.read("params.npz")))
        int8_keys = [k for k in pz.files if k.endswith("/int8")]
        assert manifest["weight_quant"] == "int8"
        assert int8_keys and all(pz[k].dtype == np.int8 for k in int8_keys)
        qbytes = sum(pz[k].nbytes for k in pz.files)
    with zipfile.ZipFile(io.BytesIO(blob_f)) as zf:
        fz = np.load(io.BytesIO(zf.read("params.npz")))
        fbytes = sum(fz[k].nbytes for k in fz.files)
    # The quantized payload must shrink (at THIS tiny scale the fp32 patch
    # conv / embeddings are a large fraction, so the ratio is modest; at
    # base scale the mixer matmuls are ~95% of the 92M params -> ~4x).
    assert qbytes < 0.75 * fbytes, (qbytes, fbytes)

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 32))
    want = np.asarray(model.apply(params, x), np.float32)
    got = np.asarray(load_bundle(blob_q).predict(x), np.float32)
    assert got.shape == want.shape
    # Weight-only int8 noise bound: per-row cosine similarity stays high
    # and absolute logit drift stays small relative to the logit scale.
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    assert np.all(cos > 0.99), cos
    assert np.max(np.abs(got - want)) < 0.35 * max(1.0, np.abs(want).max())


def test_int8_weight_quant_rejects_tp(tiny_model):
    from aum_tpu.parallel import make_mesh

    cfg, model, params = tiny_model
    mesh = make_mesh(n_data=4, n_model=2)
    with pytest.raises(ValueError, match="weight_quant"):
        export_bundle(model, params, audio_length=64, melbins=32,
                      batch_sizes=(8,), platforms=("cpu",), mesh=mesh,
                      model_axis="model", weight_quant="int8")
