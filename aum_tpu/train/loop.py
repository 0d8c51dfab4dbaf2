"""Training / evaluation loops over a device mesh.

TPU-native rebuild of the reference train/validate loops
(/root/reference/src/traintest.py:15-370):

- the train step is a single jitted function containing on-device
  augmentation (SpecAugment/noise), the forward, loss (BCE-with-logits or
  CE, traintest.py:57-60), backward, and the Adam update with the
  step-warmup + multi-step schedule baked in (aum_tpu.train.optim) — no
  host round trips in the hot loop;
- parallelism is GSPMD over a ('data','model') mesh: the batch carries a
  P('data') sharding (DP) and the params carry the TP layout from
  aum_tpu.parallel.mesh (mixer d_inner over 'model'); XLA inserts the
  gradient all-reduces and the two TP collectives per mixer over ICI;
- evaluation gathers sigmoid scores/labels to host process 0 and computes
  the reference metrics (AP/AUC/acc/d', aum_tpu.train.metrics);
- NaN-loss coercion (`nan2num`, traintest.py:154-155) and non-finite-loss
  skip (traintest.py:157-165) are preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from aum_tpu.audio.augment import noise_and_roll, spec_augment
from aum_tpu.parallel.mesh import shard_params
from aum_tpu.train.metrics import calculate_stats, d_prime


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    # Device-side epoch-loss accounting (VERDICT r2 #6): the loss of every
    # FINITE step is accumulated on device, so the epoch train_loss is the
    # exact mean over finite steps (the reference AverageMeters every step,
    # traintest.py:171-178, with non-finite steps `continue`d past the meter
    # :157-165) — with zero extra host syncs. nonfinite_count makes
    # non-finite detection exact: any poisoned step since the last reset is
    # visible at the next host read, none can be missed between log points.
    loss_sum: Any = 0.0
    nonfinite_count: Any = 0


def reset_loss_accum(state: TrainState) -> TrainState:
    """Zero the device-side epoch-loss accumulators (start of each epoch)."""
    return state.replace(loss_sum=jnp.zeros((), jnp.float32),
                         nonfinite_count=jnp.zeros((), jnp.int32))


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """On-device train-time augmentation (dataloader.py:205-228)."""

    freqm: int = 0
    timem: int = 0
    noise: bool = False


def loss_fn_of(loss_type: str) -> Callable:
    if loss_type == "BCE":
        def f(logits, labels):
            return jnp.mean(optax.sigmoid_binary_cross_entropy(
                logits.astype(jnp.float32), labels))
    elif loss_type == "CE":
        # Soft-label CE. Deliberate divergence from the reference's
        # `loss_fn(out, torch.argmax(labels.long(), 1))` (traintest.py:151):
        # `.long()` truncates every non-integer label to 0, so CE + mixup
        # upstream silently targets class 0 for all mixed samples — a
        # latent bug there. On one-hot labels (all shipped CE recipes have
        # mixup=0) the two are identical; under mixup this form is the
        # correct soft-target CE.
        def f(logits, labels):
            return jnp.mean(optax.softmax_cross_entropy(
                logits.astype(jnp.float32), labels))
    else:
        raise ValueError(loss_type)
    return f


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    loss_type: str = "BCE",
    augment: AugmentConfig = AugmentConfig(),
    nan2num: bool = False,
    donate: bool = True,
    patch_size=None,
    strides=None,
    accum_steps: int = 1,
):
    """Build the jitted sharded train step: (state, batch, rng) -> (state, loss).

    batch: {'x': (B, T, F) normalized fbank, 'y': (B, C) float labels}.
    `patch_size`/`strides` build a step specialized to a runtime patch size
    (flexible-patch-size training, traintest.py:127-148 — one jitted step
    per size, the TPU equivalent of the reference's per-batch random size).

    `accum_steps` > 1 splits the batch into that many equal microbatches
    and accumulates gradients over a lax.scan before ONE optimizer update —
    numerically the full-batch mean-loss step (equal micro sizes), at the
    activation-memory cost of a single microbatch. The reference reaches
    large effective batches only by adding GPUs (per-GPU batch_size,
    README.md:90-96); this is the single-chip equivalent, and it composes
    with the split-remat HBM cap (B<=32 bf16 — AudioMambaConfig.remat_mode)
    to reproduce any recipe's effective batch on one chip.
    """
    loss_of = loss_fn_of(loss_type)

    data_sharding = (NamedSharding(mesh, P("data"))
                     if mesh is not None else None)
    model_kwargs = {}
    if patch_size is not None:
        model_kwargs["patch_size"] = patch_size
        model_kwargs["strides"] = (strides if strides is not None
                                   else patch_size)

    def step_fn(state: TrainState, batch, rng):
        x, y = batch["x"], batch["y"]
        if data_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, data_sharding)
            y = jax.lax.with_sharding_constraint(y, data_sharding)
        k_aug, k_noise = jax.random.split(rng)
        if augment.freqm or augment.timem:
            x = spec_augment(k_aug, x, augment.freqm, augment.timem)
        if augment.noise:
            x = noise_and_roll(k_noise, x)
        # Dropout/stochastic-depth rng (AudioMamba drop_path_rate/drop_rate;
        # rate-0 models never consume it). fold_in rather than widening the
        # split above so the existing k_aug/k_noise streams stay identical.
        k_drop = jax.random.fold_in(rng, 0x0D09)

        def loss_f(p, xb, yb, kd):
            logits = model.apply(p, xb, train=True, rngs={"dropout": kd},
                                 **model_kwargs)
            loss = loss_of(logits, yb)
            if nan2num:
                loss = jnp.nan_to_num(loss)
            return loss

        if accum_steps <= 1:
            loss, grads = jax.value_and_grad(loss_f)(
                state.params, x, y, k_drop)
        else:
            if x.shape[0] % accum_steps:
                raise ValueError(
                    f"batch {x.shape[0]} not divisible by "
                    f"accum_steps={accum_steps}")
            xm = x.reshape(accum_steps, x.shape[0] // accum_steps,
                           *x.shape[1:])
            ym = y.reshape(accum_steps, y.shape[0] // accum_steps,
                           *y.shape[1:])

            def body(carry, xyi):
                l_sum, g_sum = carry
                xb, yb, i = xyi
                if data_sharding is not None:
                    xb = jax.lax.with_sharding_constraint(xb, data_sharding)
                    yb = jax.lax.with_sharding_constraint(yb, data_sharding)
                l, g = jax.value_and_grad(loss_f)(
                    state.params, xb, yb, jax.random.fold_in(k_drop, i))
                return (l_sum + l, jax.tree.map(jnp.add, g_sum, g)), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (l_sum, g_sum), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zeros),
                (xm, ym, jnp.arange(accum_steps)))
            loss = l_sum / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
        finite = jnp.isfinite(loss)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # Skip the update when the loss is non-finite (traintest.py:157-165).
        params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_params, state.params)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_opt, state.opt_state)
        if (isinstance(opt_state, tuple) and opt_state
                and isinstance(opt_state[-1], optax.ScaleByScheduleState)):
            # The lr schedule mirrors the reference's wall-epoch scheduler,
            # which steps once per epoch REGARDLESS of skipped batches
            # (scheduler.step(), traintest.py:247) — so its count must keep
            # advancing through non-finite steps, or every decay milestone
            # drifts late by the number of skipped steps. The Adam
            # count/moments above DO revert (torch Adam never .step()s on a
            # skipped batch, traintest.py:160-162).
            # Known residual divergence (ADVICE r4): this count also drives
            # the WARMUP segment of lr_at_step, while the reference's warmup
            # is keyed on its global_step, which does NOT increment on
            # continue'd non-finite batches (traintest.py:160-182). If
            # non-finite steps occur DURING warmup, our warmup lr runs
            # slightly ahead of the reference's. Kept deliberately: one
            # schedule count cannot satisfy both, decay milestones matter
            # for the shipped recipes (warmup NaNs do not occur there), and
            # wall-clock-aligned warmup is arguably more correct.
            opt_state = opt_state[:-1] + (new_opt[-1],)
        loss32 = loss.astype(jnp.float32)
        return TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            loss_sum=state.loss_sum + jnp.where(finite, loss32, 0.0),
            nonfinite_count=state.nonfinite_count
            + jnp.where(finite, 0, 1).astype(jnp.int32)), loss

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh=None):
    """Jitted forward (logits); batch sharded over 'data' when given a mesh."""

    if mesh is None:
        return jax.jit(lambda params, x: model.apply(params, x))
    data_sharding = NamedSharding(mesh, P("data"))

    def fwd(params, x):
        x = jax.lax.with_sharding_constraint(x, data_sharding)
        return model.apply(params, x)

    return jax.jit(fwd)


def sigmoid_np(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_loss(loss_type: str, logits: np.ndarray, labels: np.ndarray) -> float:
    """Host-side loss (numpy) — keeps eval free of device round-trips."""
    x = logits.astype(np.float64)
    y = labels.astype(np.float64)
    if loss_type == "BCE":
        return float(np.mean(
            np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))))
    lse = np.log(np.sum(np.exp(x - x.max(axis=-1, keepdims=True)), axis=-1)) \
        + x.max(axis=-1)
    return float(np.mean(lse - np.sum(x * y, axis=-1)))


def evaluate(
    eval_step,
    params,
    batches: Iterable,
    loss_type: str = "BCE",
    main_metric: str = "mAP",
    nan2num: bool = False,
    return_stats: bool = False,
    full_curves: bool = False,
):
    """Run eval, mirroring validate_acc (traintest.py:250-321).

    Applies sigmoid to logits (traintest.py:277 — note the reference computes
    the val loss on the *sigmoided* outputs as well, :280-283; reproduced).
    With ``nan2num``, non-finite eval outputs are coerced to 0/±max before
    the sigmoid, exactly like the reference's `if_nan2num` branch
    (traintest.py:275-276). Returns (metrics dict, scores, targets), plus
    the per-class stats list when ``return_stats`` (``full_curves`` adds
    PR/ROC curves) — callers that pickle the stats reuse this single
    calculate_stats pass instead of recomputing (527-class AP/AUC on a
    1-core host is expensive; it used to run twice per epoch).
    """
    from aum_tpu.data.pipeline import Prefetcher
    from aum_tpu.parallel.multihost import to_host_global

    outs, tgts, losses = [], [], []
    for batch in Prefetcher(iter(batches)):
        logits = eval_step(params, batch["x"])
        # Multi-process: logits are only partially addressable per host;
        # gather the global batch (accelerator.gather, traintest.py:285-287).
        # Single process: a plain host transfer.
        logits = to_host_global(logits).astype(np.float32)
        if nan2num:
            logits = np.nan_to_num(logits)
        scores = sigmoid_np(logits)
        outs.append(scores)
        tgts.append(to_host_global(batch["y"]).astype(np.float32))
        # Reference quirk: the val loss is computed on the *sigmoided*
        # outputs (traintest.py:280-283) — scores go in as the "logits".
        losses.append(_np_loss(loss_type, scores, tgts[-1]))
    scores = np.concatenate(outs, axis=0)
    targets = np.concatenate(tgts, axis=0)
    stats = calculate_stats(scores, targets, full_curves=full_curves)
    ap = np.array([s["AP"] for s in stats], dtype=np.float64)
    auc = np.array([s["auc"] for s in stats], dtype=np.float64)
    m_ap = float(np.nanmean(ap))
    m_auc = float(np.nanmean(auc))
    metrics = {
        "mAP": m_ap,
        "AUC": m_auc,
        "acc": stats[0]["acc"],
        "d_prime": d_prime(m_auc) if 0 < m_auc < 1 else float("nan"),
        "loss": float(np.mean(losses)) if losses else float("nan"),
        "main": None,
    }
    metrics["main"] = metrics["acc" if main_metric == "acc" else "mAP"]
    if return_stats:
        return metrics, scores, targets, stats
    return metrics, scores, targets


def init_train_state(model, tx, rng, example_x, mesh=None) -> TrainState:
    """Init params (+optionally place them in the mesh's TP layout) and the
    optimizer state (jitted so mu/nu inherit the param shardings).

    The init itself is jitted too: a seq_axis model's partial-manual
    shard_map (ops/seq_parallel.py::sharded_scan_in_jit) only traces under
    jit, and jit also caches the init across calls."""
    params = jax.jit(model.init)(rng, example_x)
    if mesh is not None:
        params = shard_params(params, mesh)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state,
                      loss_sum=jnp.zeros((), jnp.float32),
                      nonfinite_count=jnp.zeros((), jnp.int32))


def train_loop(
    model,
    tx,
    mesh,
    train_batches: Callable[[int], Iterable],
    eval_batches: Callable[[], Iterable],
    n_epochs: int,
    state: TrainState,
    rng: jax.Array,
    loss_type: str = "BCE",
    main_metric: str = "mAP",
    augment: AugmentConfig = AugmentConfig(),
    nan2num: bool = False,
    continue_inf: bool = True,
    exp_dir: Optional[str] = None,
    checkpointer=None,
    log_every: int = 50,
    print_fn=print,
    save_predictions: bool = False,
    flexible_patch_sizes=None,
    accum_steps: int = 1,
    profile_dir: Optional[str] = None,
    profile_steps: tuple = (3, 8),
    start_epoch: int = 1,
):
    """Epoch loop: train, validate, track best, checkpoint (traintest.py:85-247).

    Artifacts per epoch under exp_dir (traintest.py:211-242, 311-316):
    result.csv, progress.json, stats_<epoch>.pickle and (optionally)
    predictions/predictions_<epoch>.csv + target.csv.

    Non-finite losses: the jitted step always skips the parameter update on
    a non-finite loss (the safe in-graph equivalent of traintest.py:157-165).
    With ``continue_inf=False`` (the reference's default: exit on inf) the
    host raises on any non-finite loss. Detection is EXACT (the device
    accumulates a nonfinite_count every step, so none can be missed) and
    synced only every ``log_every`` steps plus once at epoch end, so the
    async dispatch pipeline never syncs per step; latency <= log_every.
    result.csv's train_loss is the exact epoch mean over finite steps via
    the device-side loss_sum (traintest.py:171-178 AverageMeter semantics).
    """
    import pickle
    import time as _time

    if flexible_patch_sizes:
        # Flexible-patch-size training (traintest.py:127-148): one jitted
        # step per size; a host RNG (identical across hosts by seed) picks
        # the size each step — the broadcast-from-rank-0 equivalent.
        steps = {ps: make_train_step(model, tx, mesh, loss_type, augment,
                                     nan2num, donate=False, patch_size=ps,
                                     accum_steps=accum_steps)
                 for ps in flexible_patch_sizes}
        flex_rng = np.random.default_rng(1234)

        def step_fn(state, batch, rng):
            ps = flexible_patch_sizes[
                int(flex_rng.integers(len(flexible_patch_sizes)))]
            return steps[ps](state, batch, rng)
    else:
        step_fn = make_train_step(model, tx, mesh, loss_type, augment,
                                  nan2num, accum_steps=accum_steps)
    eval_fn = make_eval_step(model, mesh)
    history = []
    progress = []
    best = {"epoch": 0, "main": -np.inf}
    prof_open = False
    # start_epoch > 1 = resuming a partial run (run.py --ckpt restore):
    # epoch labels/artifacts/shuffle orders continue where the restored
    # checkpoint left off instead of relabeling from 1 and overwriting
    # epoch_N checkpoints (round-5 review finding). The reference has no
    # epoch-resume at all (it restarts at 1; traintest.py:79-85).
    for epoch in range(start_epoch, n_epochs + 1):
        state = reset_loss_accum(state)
        t_epoch = _time.time()
        n_clips = 0
        n_steps = 0
        from aum_tpu.data.pipeline import Prefetcher

        for i, batch in enumerate(Prefetcher(train_batches(epoch))):
            if (profile_dir is not None and epoch == 1
                    and i == profile_steps[0]):
                # Bounded-window XLA trace (TensorBoard-loadable) of steady
                # -state training steps, past the compile steps. The
                # reference has no profiling in its train path (SURVEY §5).
                jax.profiler.start_trace(profile_dir)
                prof_open = True
            rng, krun = jax.random.split(rng)
            state, loss = step_fn(state, batch, krun)
            n_clips += int(batch["x"].shape[0])
            n_steps += 1
            if (profile_dir is not None and epoch == 1 and prof_open
                    and i + 1 >= profile_steps[1]):
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                prof_open = False
                print_fn(f"profiler trace (steps {profile_steps[0]}-"
                         f"{profile_steps[1]}) -> {profile_dir}")
            if (i + 1) % log_every == 0:
                # One host sync per log_every steps; the device-side
                # accumulators make this check EXACT over every step since
                # the epoch start (no non-finite step can slip between log
                # points), with detection latency <= log_every steps.
                n_bad = int(state.nonfinite_count)
                if n_bad and not continue_inf:
                    raise RuntimeError(
                        f"{n_bad} non-finite train loss(es) by epoch "
                        f"{epoch} step {i + 1} (continue_inf=False; "
                        "traintest.py:157-165 exit-on-inf semantics)")
                print_fn(f"epoch {epoch} step {i+1}: "
                         f"loss {float(loss):.4f}")
        if prof_open:  # epoch shorter than the profile window
            jax.profiler.stop_trace()
            prof_open = False
            print_fn(f"profiler trace (short epoch) -> {profile_dir}")
        train_secs = _time.time() - t_epoch
        n_bad = int(state.nonfinite_count)
        if n_bad and not continue_inf:
            raise RuntimeError(
                f"{n_bad} non-finite train loss(es) in epoch {epoch} "
                "(continue_inf=False)")
        n_finite = n_steps - n_bad
        epoch_loss = (float(state.loss_sum) / n_finite if n_finite
                      else float("nan"))
        metrics, scores, targets, epoch_stats = evaluate(
            eval_fn, state.params, eval_batches(), loss_type, main_metric,
            nan2num=nan2num, return_stats=True, full_curves=True)
        metrics["epoch"] = epoch
        # Exact epoch mean over finite steps (traintest.py:171-178 semantics).
        metrics["train_loss"] = epoch_loss if n_steps else None
        metrics["clips_per_sec"] = (n_clips / train_secs
                                    if train_secs > 0 else 0.0)
        history.append(metrics)
        print_fn(f"epoch {epoch}: {metrics}")
        if metrics["main"] > best["main"]:
            best = {"epoch": epoch, "main": metrics["main"]}
            if checkpointer is not None:
                checkpointer.save_best(state, epoch, metrics)
        if checkpointer is not None:
            checkpointer.save_latest(state, epoch, metrics)
        if exp_dir is not None:
            import json as _json
            import os as _os

            _write_result_csv(exp_dir, history)
            progress.append([epoch, int(state.step), best["epoch"],
                             float(best["main"])])
            with open(_os.path.join(exp_dir, "progress.json"), "w") as f:
                _json.dump(progress, f)
            with open(_os.path.join(exp_dir,
                                    f"stats_{epoch}.pickle"), "wb") as f:
                # Reference pickles the PER-CLASS stats list each epoch
                # (traintest.py:241-242), curves included; the summary
                # metrics live in result.csv/progress.json. Reuses the
                # single full-curves pass from evaluate() above.
                pickle.dump(epoch_stats, f)
            if save_predictions:
                pdir = _os.path.join(exp_dir, "predictions")
                _os.makedirs(pdir, exist_ok=True)
                np.savetxt(_os.path.join(
                    pdir, f"predictions_{epoch}.csv"), scores, delimiter=",")
                if epoch == 1:
                    np.savetxt(_os.path.join(pdir, "target.csv"), targets,
                               delimiter=",")
    return state, history, best


def _write_result_csv(exp_dir: str, history):
    """result.csv artifact (traintest.py:211-216)."""
    import os

    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "result.csv"), "w") as f:
        f.write("epoch,mAP,AUC,acc,d_prime,loss,train_loss\n")
        for m in history:
            f.write(f"{m['epoch']},{m['mAP']},{m['AUC']},{m['acc']},"
                    f"{m['d_prime']},{m['loss']},{m['train_loss']}\n")


def evaluate_ensemble(
    eval_step,
    param_trees,
    batches_fn,
    loss_type: str = "BCE",
    main_metric: str = "mAP",
    nan2num: bool = False,
):
    """Cumulative prediction-ensemble eval (`validate_ensemble`,
    traintest.py:323-340): average sigmoid scores across checkpoints and
    score the running ensemble after each one."""
    cum = None
    results = []
    targets = None
    for k, params in enumerate(param_trees, start=1):
        _, scores, targets = evaluate(eval_step, params, batches_fn(),
                                      loss_type, main_metric,
                                      nan2num=nan2num)
        cum = scores if cum is None else cum + scores
        stats = calculate_stats(cum / k, targets)
        ap = np.nanmean([s["AP"] for s in stats])
        results.append({"n_models": k, "mAP": float(ap),
                        "acc": stats[0]["acc"]})
    return results


def average_ensemble_views(scores: np.ndarray, record_index: np.ndarray):
    """Average test-time ensemble-view predictions per record (the EPIC
    NUM_ENSEMBLE_VIEWS protocol, epic loader test split)."""
    uniq = np.unique(record_index)
    out = np.zeros((len(uniq), scores.shape[1]), scores.dtype)
    for i, r in enumerate(uniq):
        out[i] = scores[record_index == r].mean(axis=0)
    return uniq, out
