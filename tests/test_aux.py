"""Auxiliary subsystems: ensemble eval, weight averaging, profiling meters,
logging helpers (SURVEY.md §5)."""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from aum_tpu.logging_utils import log_json_stats, setup_logging
from aum_tpu.train import average_params
from aum_tpu.train.loop import average_ensemble_views, evaluate_ensemble
from aum_tpu.train.profiling import StepTimer, annotate
from aum_tpu.utils import AverageMeter


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2 and m.val == 3.0
    m.reset()
    assert m.count == 0


def test_average_params():
    trees = [{"a": np.full((2, 2), float(i)), "b": np.array([i * 2.0])}
             for i in range(1, 4)]
    avg = average_params(trees)
    np.testing.assert_allclose(avg["a"], 2.0)
    np.testing.assert_allclose(avg["b"], 4.0)


def test_evaluate_ensemble_improves_with_complementary_models():
    # Two "models" each perfect on half the classes: ensemble acc == 1.
    targets = np.eye(4, dtype=np.float32)[np.arange(16) % 4]

    def eval_step_factory(good_classes):
        def eval_step(params, x):
            del params
            logits = np.full((x.shape[0], 4), -5.0, np.float32)
            for i in range(x.shape[0]):
                c = int(targets[i].argmax())
                logits[i, c] = 5.0 if c in good_classes else -5.0
                if c not in good_classes:
                    logits[i, (c + 1) % 4] = 5.0
            return jnp.asarray(logits)
        return eval_step

    x = np.zeros((16, 3), np.float32)
    batches = lambda: [{"x": x, "y": targets}]
    step_a = eval_step_factory({0, 1})
    step_b = eval_step_factory({2, 3})

    def combined(params, xx):
        return step_a(None, xx) if params == "a" else step_b(None, xx)

    results = evaluate_ensemble(combined, ["a", "b"], batches,
                                loss_type="CE", main_metric="acc")
    assert len(results) == 2
    assert results[1]["acc"] >= results[0]["acc"]


def test_average_ensemble_views():
    scores = np.arange(20.0).reshape(10, 2)
    rec = np.repeat([3, 7], 5)
    uniq, avg = average_ensemble_views(scores, rec)
    np.testing.assert_array_equal(uniq, [3, 7])
    np.testing.assert_allclose(avg[0], scores[:5].mean(axis=0))


def test_step_timer():
    import time

    t = StepTimer(warmup_steps=1)
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop(n_items=4)
    assert t.steps_timed == 2
    assert 0.005 < t.mean_step_time < 0.1
    assert t.items_per_sec > 0


def test_annotate_context():
    with annotate("test-region"):
        _ = jnp.sum(jnp.ones(8))


def test_logging(tmp_path, capsys):
    lg = setup_logging(str(tmp_path))
    lg.info("hello")
    log_json_stats({"mAP": 0.123456789, "epoch": 2}, lg)
    with open(tmp_path / "stdout.log") as f:
        content = f.read()
    assert "hello" in content
    assert '"mAP": 0.12346' in content


def test_cli_scripts_gen_weight_and_norm_stats(tmp_path):
    """Smoke the dataset prep CLIs (gen_weight_file / get_norm_stats
    equivalents of exps/audioset/gen_weight_file.py and
    src/get_norm_stats.py)."""
    import json
    import subprocess
    import sys
    import wave as wave_mod

    rng = np.random.default_rng(0)
    entries = []
    for i in range(4):
        p = str(tmp_path / f"c{i}.wav")
        data = (np.clip(rng.standard_normal(8000) * 0.1, -1, 1)
                * 32767).astype("<i2")
        with wave_mod.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(data.tobytes())
        entries.append({"wav": p, "labels": f"/m/{i % 2}"})
    (tmp_path / "d.json").write_text(json.dumps({"data": entries}))
    (tmp_path / "l.csv").write_text(
        "index,mid,display_name\n0,/m/0,a\n1,/m/1,b\n")

    env = dict(JAX_PLATFORMS="cpu", PATH="/usr/bin:/bin",
               HOME=str(tmp_path))
    import os as _os

    env.update({k: v for k, v in _os.environ.items()
                if k not in env})
    env["JAX_PLATFORMS"] = "cpu"

    out = subprocess.run(
        [sys.executable, "scripts/gen_weight_file.py", "--data",
         str(tmp_path / "d.json"), "--label-csv", str(tmp_path / "l.csv"),
         "--out", str(tmp_path / "w.csv")],
        capture_output=True, text=True, cwd=_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__))), env=env)
    assert out.returncode == 0, out.stderr[-500:]
    assert len((tmp_path / "w.csv").read_text().strip().split("\n")) == 4

    out = subprocess.run(
        [sys.executable, "scripts/get_norm_stats.py", "--data",
         str(tmp_path / "d.json"), "--label-csv", str(tmp_path / "l.csv"),
         "--target-length", "64", "--batch-size", "2"],
        capture_output=True, text=True, cwd=_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__))), env=env)
    assert out.returncode == 0, out.stderr[-500:]
    assert "mean=" in out.stdout


def test_cli_infer_smoke(tmp_path):
    """Smoke scripts/infer.py end-to-end on a generated wav with a tiny
    random-init model (the reference inference notebook's single-clip path,
    examples/inference/inference.ipynb)."""
    import os as _os
    import subprocess
    import sys
    import wave as wave_mod

    rng = np.random.default_rng(0)
    p = str(tmp_path / "clip.wav")
    data = (np.clip(rng.standard_normal(16000) * 0.1, -1, 1)
            * 32767).astype("<i2")
    with wave_mod.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(data.tobytes())
    (tmp_path / "l.csv").write_text(
        "index,mid,display_name\n"
        + "\n".join(f"{i},/m/{i},class{i}" for i in range(4)))

    env = dict(_os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/infer.py", "--wav", p,
         "--label-csv", str(tmp_path / "l.csv"),
         "--set", "depth=2", "--set", "n_class=4",
         "--set", "model_type=tiny", "--set", "dtype=float32",
         "--set", "audio_length=128", "--topk", "2"],
        capture_output=True, text=True, cwd=_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__))), env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-800:]
    assert "random-init" in out.stdout
    assert "class" in out.stdout


def test_train_loop_profile_window(tmp_path):
    """train_loop(profile_dir=...) captures a bounded jax.profiler trace of
    epoch-1 training steps and writes the TensorBoard plugin directory —
    the runner exposes it as --profile-dir (reference: no profiling in its
    train path, SURVEY §5)."""
    import glob
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.train import TrainHyperParams, make_optimizer
    from aum_tpu.train.loop import (
        AugmentConfig,
        init_train_state,
        train_loop,
    )

    cfg = AudioMambaConfig(depth=2, embed_dim=64, spectrogram_size=(128, 32),
                           num_classes=4, d_state=8, remat=False)
    model = AudioMamba(cfg, use_kernel=False)
    tx = make_optimizer(TrainHyperParams(lr=1e-3, n_epochs=1),
                        steps_per_epoch=4)
    x = np.random.default_rng(0).standard_normal((8, 32, 128)).astype(
        np.float32)
    y = np.eye(4, dtype=np.float32)[np.arange(8) % 4]
    batches = [{"x": jnp.asarray(x[i:i + 2]), "y": jnp.asarray(y[i:i + 2])}
               for i in range(0, 8, 2)]
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(x[:1]))
    prof = str(tmp_path / "trace")
    train_loop(model, tx, None,
               train_batches=lambda e: list(batches),
               eval_batches=lambda: list(batches),
               n_epochs=1, state=state, rng=jax.random.PRNGKey(1),
               loss_type="CE", main_metric="acc", augment=AugmentConfig(),
               exp_dir=None, profile_dir=prof, profile_steps=(1, 3))
    found = glob.glob(os.path.join(prof, "**", "*.xplane.pb"),
                      recursive=True)
    assert found, f"no trace written under {prof}"
