"""Optimizer/schedule semantics, metrics, and an end-to-end training slice."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aum_tpu.models import AudioMamba, AudioMambaConfig
from aum_tpu.parallel import make_mesh
from aum_tpu.train import (
    TrainHyperParams,
    calculate_stats,
    evaluate,
    lr_at_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from aum_tpu.train.loop import AugmentConfig, init_train_state


def test_lr_schedule_multistep_and_warmup():
    hp = TrainHyperParams(lr=1e-4, lrscheduler_start=2, lrscheduler_step=1,
                          lrscheduler_decay=0.5, warmup=True)
    spe = 2000
    # During warmup (step <= 1000): staircase every 50 steps.
    assert float(lr_at_step(hp, 0, spe)) == 0.0
    assert np.isclose(float(lr_at_step(hp, 49, spe)), 0.0)
    assert np.isclose(float(lr_at_step(hp, 50, spe)), 50 / 1000 * 1e-4)
    assert np.isclose(float(lr_at_step(hp, 999, spe)), 950 / 1000 * 1e-4)
    assert np.isclose(float(lr_at_step(hp, 1000, spe)), 1e-4)
    # After warmup, epoch 1 (steps < 2000): base lr.
    assert np.isclose(float(lr_at_step(hp, 1500, spe)), 1e-4)
    # Epoch 2 (torch: milestones [2,3,...], epoch e uses #m <= e-1): still base.
    assert np.isclose(float(lr_at_step(hp, 2500, spe)), 1e-4)
    # Epoch 3: one milestone (2) passed -> 0.5x.
    assert np.isclose(float(lr_at_step(hp, 4500, spe)), 0.5e-4)
    # Epoch 4: milestones 2,3 -> 0.25x.
    assert np.isclose(float(lr_at_step(hp, 6500, spe)), 0.25e-4)


def test_lr_warmup_clamp_when_w_not_multiple_of_q():
    """ADVICE r4: off-recipe bs_scale_factor where w = 1000//s is NOT a
    multiple of q = 50//s (s=4: w=250, q=12). The reference's warm writes
    land only at multiples of q (traintest.py:120-124), so the LAST warm
    write is at (w//q)*q = 240 with lr 0.96*base — never a write at w
    itself; that value holds until the next epoch boundary."""
    hp = TrainHyperParams(lr=1e-4, lrscheduler_start=20, lrscheduler_step=1,
                          lrscheduler_decay=0.5, warmup=True,
                          bs_scale_factor=4)
    spe = 2000
    assert np.isclose(float(lr_at_step(hp, 240, spe)), 240 / 250 * 1e-4)
    # Steps 241..251: the 240 write holds (no write at w=250).
    for step in (245, 250, 251, 400):
        assert np.isclose(float(lr_at_step(hp, step, spe)),
                          240 / 250 * 1e-4), step
    # Next epoch boundary: the scheduler writes base lr (epoch < start).
    assert np.isclose(float(lr_at_step(hp, 2100, spe)), 1e-4)


def test_lr_schedule_epic():
    hp = TrainHyperParams(lr=1e-3, epic=True, warmup=True)
    spe = 100
    w = 2 * spe
    assert np.isclose(float(lr_at_step(hp, 0, spe)), 1e-3 * 0.01)
    assert np.isclose(float(lr_at_step(hp, w - 1, spe)),
                      1e-3 * 0.01 + (w - 1) * (1e-3 - 1e-5) / w)
    assert np.isclose(float(lr_at_step(hp, w, spe)), 1e-3)
    # With warmup=True the reference writes lr = args.lr on EVERY
    # post-warmup step (traintest.py:113-115), clobbering the LambdaLR
    # decay at each step — the shipped EPIC recipe never decays. An
    # earlier revision here applied the 0.05/0.01 decay on top; that was
    # a live divergence on the shipped recipe (round-5 review finding).
    assert np.isclose(float(lr_at_step(hp, 10 * spe, spe)), 1e-3)
    assert np.isclose(float(lr_at_step(hp, 20 * spe, spe)), 1e-3)
    # The LambdaLR decay applies when warmup is off (no per-step writes).
    hp0 = TrainHyperParams(lr=1e-3, epic=True, warmup=False)
    assert np.isclose(float(lr_at_step(hp0, 5 * spe, spe)), 1e-3)
    assert np.isclose(float(lr_at_step(hp0, 10 * spe, spe)), 1e-3 * 0.05)
    assert np.isclose(float(lr_at_step(hp0, 20 * spe, spe)), 1e-3 * 0.01)


def test_lr_schedule_warmup_spanning_epochs():
    """Last-write-wins interleave when warmup spans epoch boundaries
    (traintest.py:120-124 warm writes at steps {0, q, .., w} vs
    scheduler.step() writes at each epoch boundary). Not reachable from
    the shipped recipes (spe > 1000 there) but pinned for off-recipe
    configs."""
    hp = TrainHyperParams(lr=1e-4, lrscheduler_start=2, lrscheduler_step=1,
                          lrscheduler_decay=0.5, warmup=True)
    spe = 130  # q=50, w=1000: warmup spans ~8 epochs
    # Step 260 = epoch-3 start, not a multiple of 50: the scheduler wrote
    # most recently (epoch 3 -> one milestone passed -> 0.5x).
    assert np.isclose(float(lr_at_step(hp, 260, spe)), 0.5e-4)
    # Step 300 (multiple of 50, >= epoch start 260): warm write wins.
    assert np.isclose(float(lr_at_step(hp, 300, spe)), 300 / 1000 * 1e-4)
    assert np.isclose(float(lr_at_step(hp, 349, spe)), 300 / 1000 * 1e-4)
    # After w=1000 (inside epoch 8, start 910): the step-1000 warm write
    # (full lr) holds until that epoch's end...
    assert np.isclose(float(lr_at_step(hp, 1030, spe)), 1e-4)
    # ...and from the next epoch boundary the schedule rules again
    # (epoch 9 -> milestones 2..8 -> 0.5^7).
    assert np.isclose(float(lr_at_step(hp, 1040, spe)), 1e-4 * 0.5 ** 7)


def test_adam_matches_torch_semantics():
    """Our optax chain must reproduce torch.optim.Adam with weight_decay."""
    import torch

    hp = TrainHyperParams(lr=1e-3, weight_decay=0.01, warmup=False,
                          lrscheduler_start=1000)
    tx = make_optimizer(hp, steps_per_epoch=10**9)

    w0 = np.random.default_rng(0).standard_normal((5, 3)).astype(np.float32)
    grads = [np.random.default_rng(i + 1).standard_normal((5, 3))
             .astype(np.float32) for i in range(5)]

    # torch
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=1e-3, weight_decay=0.01,
                           betas=(0.95, 0.999), eps=1e-8)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    # ours
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), rtol=2e-5, atol=2e-6)


def test_metrics_against_sklearn():
    rng = np.random.default_rng(0)
    scores = rng.random((64, 5)).astype(np.float32)
    targets = (rng.random((64, 5)) < 0.3).astype(np.float32)
    targets[targets.sum(1) == 0, 0] = 1.0
    stats = calculate_stats(scores, targets)
    from sklearn import metrics as skm

    for k in range(5):
        ap = skm.average_precision_score(targets[:, k], scores[:, k])
        assert np.isclose(stats[k]["AP"], ap), k


def test_end_to_end_training_decreases_loss():
    """Tiny synthetic classification must be learnable (loss decreases and
    accuracy exceeds chance) through the full sharded train step."""
    cfg = AudioMambaConfig(
        depth=2, embed_dim=96, spectrogram_size=(128, 64), num_classes=4,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    mesh = make_mesh(n_data=4, n_model=2)

    hp = TrainHyperParams(lr=2e-3, warmup=False, lrscheduler_start=1000,
                          weight_decay=0.0)
    tx = make_optimizer(hp, steps_per_epoch=100)

    rng = np.random.default_rng(0)
    n, bsz = 64, 16
    labels = rng.integers(0, 4, n)
    # Class-dependent frequency bands make the task easy.
    xs = rng.standard_normal((n, 64, 128)).astype(np.float32) * 0.1
    for i, c in enumerate(labels):
        xs[i, :, c * 32:(c + 1) * 32] += 1.0
    ys = np.eye(4, dtype=np.float32)[labels]

    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(xs[:1]), mesh=mesh)
    step = make_train_step(model, tx, mesh, loss_type="CE",
                           augment=AugmentConfig(), donate=False)
    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(30):
        i = (it * bsz) % n
        batch = {"x": jnp.asarray(xs[i:i + bsz]),
                 "y": jnp.asarray(ys[i:i + bsz])}
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses

    eval_step = make_eval_step(model, mesh)
    metrics, scores, targets = evaluate(
        eval_step, state.params,
        [{"x": jnp.asarray(xs), "y": jnp.asarray(ys)}],
        loss_type="CE", main_metric="acc")
    assert metrics["acc"] > 0.5, metrics


def test_grad_accumulation_matches_full_batch():
    """accum_steps=K must reproduce the full-batch step (mean loss over
    equal microbatches == full-batch mean loss), params matching to fp
    tolerance (summation order differs)."""
    cfg = AudioMambaConfig(
        depth=2, embed_dim=96, spectrogram_size=(128, 64), num_classes=4,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    mesh = make_mesh(n_data=4, n_model=2)
    hp = TrainHyperParams(lr=2e-3, warmup=False, lrscheduler_start=1000,
                          weight_decay=0.0)
    tx = make_optimizer(hp, steps_per_epoch=100)

    rng = np.random.default_rng(3)
    bsz = 8
    xs = rng.standard_normal((bsz, 64, 128)).astype(np.float32) * 0.3
    ys = np.eye(4, dtype=np.float32)[rng.integers(0, 4, bsz)]
    batch = {"x": jnp.asarray(xs), "y": jnp.asarray(ys)}

    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(xs[:1]), mesh=mesh)
    step1 = make_train_step(model, tx, mesh, loss_type="CE",
                            augment=AugmentConfig(), donate=False)
    step2 = make_train_step(model, tx, mesh, loss_type="CE",
                            augment=AugmentConfig(), donate=False,
                            accum_steps=2)
    k = jax.random.PRNGKey(5)
    s1, l1 = step1(state, batch, k)
    s2, l2 = step2(state, batch, k)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree.leaves(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_flexible_patch_size_training_runs():
    """Flexible training (traintest.py:127-148): steps alternate patch sizes
    and all update the same params."""
    from aum_tpu.train.loop import train_loop
    from aum_tpu.train import Checkpointer

    cfg = AudioMambaConfig(
        depth=2, embed_dim=96, spectrogram_size=(128, 64), num_classes=3,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    mesh = make_mesh(n_data=8, n_model=1)
    hp = TrainHyperParams(lr=1e-3, warmup=False, lrscheduler_start=100)
    tx = make_optimizer(hp, steps_per_epoch=4)
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((16, 64, 128)).astype(np.float32)
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(xs[:1]), mesh=mesh)

    def batches(epoch):
        for i in range(0, 16, 8):
            yield {"x": jnp.asarray(xs[i:i + 8]),
                   "y": jnp.asarray(ys[i:i + 8])}

    state, history, best = train_loop(
        model, tx, mesh, batches, lambda: batches(0), n_epochs=1,
        state=state, rng=jax.random.PRNGKey(1), loss_type="CE",
        main_metric="acc", flexible_patch_sizes=[16, 8])
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])


def test_nonfinite_loss_skip_and_continue_inf():
    """A non-finite loss must (a) leave params untouched (in-step skip) and
    (b) abort the loop when continue_inf=False (traintest.py:157-165)."""
    import pytest
    from aum_tpu.train.loop import train_loop

    cfg = AudioMambaConfig(
        depth=1, embed_dim=96, spectrogram_size=(128, 32), num_classes=3,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    hp = TrainHyperParams(lr=1e-3, warmup=False, lrscheduler_start=100)
    tx = make_optimizer(hp, steps_per_epoch=2)
    x_bad = np.full((2, 32, 128), np.inf, np.float32)  # -> non-finite loss
    y = np.eye(3, dtype=np.float32)[[0, 1]]
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(x_bad[:1]), mesh=mesh)
    step = make_train_step(model, tx, mesh, loss_type="CE",
                           augment=AugmentConfig(), donate=False)
    p_before = jax.tree.map(np.asarray, state.params)
    new_state, loss = step(
        state, {"x": jnp.asarray(x_bad), "y": jnp.asarray(y)},
        jax.random.PRNGKey(1))
    assert not np.isfinite(float(loss))
    jax.tree.map(np.testing.assert_array_equal, p_before,
                 jax.tree.map(np.asarray, new_state.params))

    def batches(epoch=0):
        yield {"x": jnp.asarray(x_bad), "y": jnp.asarray(y)}

    with pytest.raises(RuntimeError, match="non-finite"):
        train_loop(model, tx, mesh, batches, batches, n_epochs=1,
                   state=state, rng=jax.random.PRNGKey(1), loss_type="CE",
                   main_metric="acc", continue_inf=False, log_every=1)


def test_epoch_train_loss_is_exact_mean_of_step_losses(tmp_path):
    """VERDICT r2 #6: result.csv's train_loss must equal the mean of EVERY
    per-step loss (device-side loss_sum accumulator), not a log_every
    subsample; non-finite steps are excluded like the reference's
    continue-before-AverageMeter (traintest.py:157-165, 171-178)."""
    from aum_tpu.train.loop import reset_loss_accum, train_loop

    cfg = AudioMambaConfig(
        depth=1, embed_dim=96, spectrogram_size=(128, 32), num_classes=3,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    hp = TrainHyperParams(lr=1e-3, warmup=False, lrscheduler_start=100)
    tx = make_optimizer(hp, steps_per_epoch=7)

    rng = np.random.default_rng(5)
    xs = rng.standard_normal((14, 32, 128)).astype(np.float32)
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 14)]

    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(xs[:1]), mesh=mesh)
    step = make_train_step(model, tx, mesh, loss_type="CE",
                           augment=AugmentConfig(), donate=False)

    # Manually collect every per-step loss.
    per_step = []
    st = reset_loss_accum(state)
    key = jax.random.PRNGKey(1)
    for i in range(7):
        key, k = jax.random.split(key)
        st, loss = step(st, {"x": jnp.asarray(xs[2 * i:2 * i + 2]),
                             "y": jnp.asarray(ys[2 * i:2 * i + 2])}, k)
        per_step.append(float(loss))
    assert int(st.nonfinite_count) == 0
    np.testing.assert_allclose(float(st.loss_sum) / 7, np.mean(per_step),
                               rtol=1e-6)

    # Through train_loop with a large log_every (no step ever sampled):
    # train_loss must still be the exact mean of ALL step losses.
    def batches(epoch=0):
        for i in range(7):
            yield {"x": jnp.asarray(xs[2 * i:2 * i + 2]),
                   "y": jnp.asarray(ys[2 * i:2 * i + 2])}

    state2, history, _ = train_loop(
        model, tx, mesh, batches, batches, n_epochs=1, state=state,
        rng=jax.random.PRNGKey(1), loss_type="CE", main_metric="acc",
        log_every=1000, exp_dir=str(tmp_path))
    # The loop's rng split sequence matches the manual one above, and
    # augmentation is off, so the losses are identical.
    np.testing.assert_allclose(history[0]["train_loss"],
                               np.mean(per_step), rtol=1e-6)

    # A poisoned step is excluded from the mean and counted. (state2, not
    # state: train_loop's jitted step donates its state argument, so the
    # original `state` buffers are deleted by now.)
    st = reset_loss_accum(state2)
    st, _ = step(st, {"x": jnp.asarray(xs[:2]), "y": jnp.asarray(ys[:2])},
                 jax.random.PRNGKey(2))
    good = float(st.loss_sum)
    st, loss = step(
        st, {"x": jnp.full((2, 32, 128), np.inf, np.float32),
             "y": jnp.asarray(ys[:2])}, jax.random.PRNGKey(3))
    assert not np.isfinite(float(loss))
    assert int(st.nonfinite_count) == 1
    np.testing.assert_allclose(float(st.loss_sum), good, rtol=1e-7)


def test_evaluate_nan2num_coerces_eval_outputs():
    """Reference `if_nan2num` also sanitizes *eval* outputs before the
    sigmoid (traintest.py:275-276); evaluate(nan2num=True) must reproduce
    that (VERDICT r3 weak #6b)."""
    from aum_tpu.train.loop import evaluate

    logits = np.array([[2.0, np.nan], [np.inf, -1.0]], np.float32)
    batches = [{"x": jnp.zeros((2, 4)), "y": jnp.asarray(
        np.array([[1, 0], [0, 1]], np.float32))}]

    def eval_step(params, x):
        return jnp.asarray(logits)

    m_raw, scores_raw, _ = evaluate(eval_step, None, list(batches),
                                    "BCE", "acc", nan2num=False)
    assert np.isnan(scores_raw).any()
    m, scores, _ = evaluate(eval_step, None, list(batches),
                            "BCE", "acc", nan2num=True)
    assert np.isfinite(scores).all()
    assert np.isfinite(m["loss"])
    # torch.nan_to_num semantics: nan->0 (sigmoid 0.5), inf->finite max.
    np.testing.assert_allclose(scores[0, 1], 0.5)
    assert scores[1, 0] == 1.0


def test_schedule_count_advances_on_skipped_nonfinite_steps():
    """The reference's epoch scheduler steps once per wall epoch regardless
    of skipped batches (scheduler.step(), traintest.py:247), while torch
    Adam's state only advances on applied updates (:160-162). The skip
    path must therefore keep the lr-schedule count advancing while the
    Adam count/moments revert (round-5 review finding: every decay
    milestone drifted late by the number of skipped steps)."""
    cfg = AudioMambaConfig(
        depth=1, embed_dim=96, spectrogram_size=(128, 32), num_classes=3,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    hp = TrainHyperParams(lr=1e-3, warmup=False, lrscheduler_start=100)
    tx = make_optimizer(hp, steps_per_epoch=2)
    x = np.random.default_rng(0).standard_normal(
        (2, 32, 128)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[[0, 1]]
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(x[:1]))
    step = make_train_step(model, tx, None, loss_type="CE",
                           augment=AugmentConfig(), donate=False)
    # opt_state = (add_decayed EmptyState, ScaleByAdamState,
    #              ScaleByScheduleState) — the chain in make_optimizer.
    assert isinstance(state.opt_state[-1], optax.ScaleByScheduleState)

    bad = {"x": np.full_like(x, np.inf), "y": y}
    st, loss = step(state, bad, jax.random.PRNGKey(1))
    assert not np.isfinite(float(loss))
    assert int(st.nonfinite_count) == 1
    assert int(st.opt_state[1].count) == 0      # Adam reverted
    assert int(st.opt_state[-1].count) == 1     # schedule advanced
    # Moments reverted too (all still zero).
    assert all(float(jnp.abs(l).max()) == 0
               for l in jax.tree.leaves(st.opt_state[1].mu))

    st2, loss2 = step(st, {"x": x, "y": y}, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss2))
    assert int(st2.opt_state[1].count) == 1
    assert int(st2.opt_state[-1].count) == 2


def test_train_loop_start_epoch(tmp_path):
    """start_epoch continues labeling/artifacts from a resume point."""
    from aum_tpu.train.loop import train_loop

    cfg = AudioMambaConfig(
        depth=1, embed_dim=96, spectrogram_size=(128, 32), num_classes=3,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    hp = TrainHyperParams(lr=1e-3, warmup=False, lrscheduler_start=100)
    tx = make_optimizer(hp, steps_per_epoch=2)
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((4, 32, 128)).astype(np.float32)
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 4)]
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(xs[:1]))

    def batches(epoch=0):
        for i in range(0, 4, 2):
            yield {"x": jnp.asarray(xs[i:i + 2]),
                   "y": jnp.asarray(ys[i:i + 2])}

    _, history, best = train_loop(
        model, tx, None, batches, batches, n_epochs=3, state=state,
        rng=jax.random.PRNGKey(1), loss_type="CE", main_metric="acc",
        exp_dir=str(tmp_path), start_epoch=2)
    assert [h["epoch"] for h in history] == [2, 3]
    assert best["epoch"] in (2, 3)
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "stats_2.pickle"))
    assert not os.path.exists(os.path.join(str(tmp_path), "stats_1.pickle"))
