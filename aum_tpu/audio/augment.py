"""On-device audio augmentations: SpecAugment, waveform mixup, noise+roll.

The reference applies these per-sample on the host inside the DataLoader
(/root/reference/src/dataloader.py:126-128 mixup at waveform level with
lambda~Beta(10,10); :205-217 torchaudio Frequency/TimeMasking; :226-228 noise
+ random time roll). Here they are batched, jittable JAX functions driven by
explicit PRNG keys, so augmentation runs on the TPU after the fbank — part of
the on-device frontend (BASELINE.json north star).

Semantics notes:
- `torchaudio.transforms.FrequencyMasking(p)` / `TimeMasking(p)` draw
  mask width ~ U{0..p} and start ~ U{0..dim-width} per sample, masking with
  value 0.0 — matched here (masking the *normalized* spectrogram region with
  0 happens pre-normalization in the reference; we apply masks on the raw
  fbank exactly like the reference does).
- mixup: fbank(lam * w1 + (1-lam) * w2) with the mixed waveform re-mean-
  centered (dataloader.py:126-131); labels mix as lam*y1 + (1-lam)*y2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(
    key: jax.Array,
    fb: jax.Array,
    freq_mask_param: int,
    time_mask_param: int,
    num_freq_masks: int = 1,
    num_time_masks: int = 1,
    mask_value: float = 0.0,
) -> jax.Array:
    """Batched SpecAugment masking. fb: (B, T, F)."""
    b, t, f = fb.shape
    keys = jax.random.split(key, 2 * (num_freq_masks + num_time_masks))
    ki = 0

    def mask_axis(x, axis_len, param, kw, ks, axis):
        width = jax.random.randint(kw, (b,), 0, param + 1)
        start = (jax.random.uniform(ks, (b,))
                 * (axis_len - width + 1).astype(jnp.float32))
        start = jnp.floor(start).astype(jnp.int32)
        pos = jnp.arange(axis_len)
        m = (pos[None, :] >= start[:, None]) & (
            pos[None, :] < (start + width)[:, None])
        shape = [b, 1, 1]
        shape[axis] = axis_len
        m = m.reshape(shape)
        return jnp.where(m, jnp.asarray(mask_value, x.dtype), x)

    for _ in range(num_freq_masks):
        if freq_mask_param > 0:
            fb = mask_axis(fb, f, freq_mask_param, keys[ki], keys[ki + 1], 2)
        ki += 2
    for _ in range(num_time_masks):
        if time_mask_param > 0:
            fb = mask_axis(fb, t, time_mask_param, keys[ki], keys[ki + 1], 1)
        ki += 2
    return fb


def mixup_waveforms(
    key: jax.Array,
    wave: jax.Array,
    labels: jax.Array,
    mixup_rate: float,
    beta: float = 10.0,
    partner_wave: jax.Array | None = None,
    partner_labels: jax.Array | None = None,
):
    """Batched waveform mixup (dataloader.py:126-131, 176-186).

    Each sample is mixed, with probability `mixup_rate`, with a random
    partner sample: w = lam*w1 + (1-lam)*w2, lam ~ Beta(beta, beta), then
    re-mean-centered; labels become lam*y1 + (1-lam)*y2.

    Semantics deviation from the reference (documented): the reference draws
    the mixup partner uniformly from the WHOLE dataset on the host
    (dataloader.py:110 `random.randint(0, len(self.data)-1)` + a second
    decode). A whole-dataset draw would force a second host decode per
    sample, so here the partner is drawn on-device from a partner *pool*:
    by default the batch itself; when `partner_wave`/`partner_labels` are
    given (the pipeline passes the previous batch, doubling the pool to
    2B samples drawn by an independent sampler pass), partners come from
    `concat(batch, partner_pool)`. At the AudioSet recipe's B=12 under the
    balanced sampler, in-batch-only partners are few and correlated; the
    previous-batch pool restores cross-draw diversity while staying jittable
    with zero extra host decodes.

    wave: (B, S) mean-centered waveforms. labels: (B, C) multi-hot floats.
    partner_wave/partner_labels: optional (P, S)/(P, C) extra partner pool.
    Returns (mixed_wave, mixed_labels).
    """
    b = wave.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    lam = jax.random.beta(k1, beta, beta, (b,))
    if partner_wave is not None:
        pool_w = jnp.concatenate([wave, partner_wave], axis=0)
        pool_y = jnp.concatenate([labels, partner_labels], axis=0)
    else:
        pool_w, pool_y = wave, labels
    partner = jax.random.randint(k2, (b,), 0, pool_w.shape[0])
    do_mix = jax.random.uniform(k3, (b,)) < mixup_rate

    lam_eff = jnp.where(do_mix, lam, 1.0)
    w2 = pool_w[partner]
    mixed = lam_eff[:, None] * wave + (1.0 - lam_eff)[:, None] * w2
    mixed = mixed - jnp.mean(mixed, axis=1, keepdims=True)
    y2 = pool_y[partner]
    mixed_labels = lam_eff[:, None] * labels + (1.0 - lam_eff)[:, None] * y2
    return mixed, mixed_labels


def normalize(fb: jax.Array, mean: float, std: float) -> jax.Array:
    """Dataset normalization: (x - mean) / (2 * std) (dataloader.py:220-221)."""
    return (fb - mean) / (2.0 * std)


def noise_and_roll(key: jax.Array, fb: jax.Array, roll_max: int = 10) -> jax.Array:
    """SpeechCommands noise augmentation (dataloader.py:226-228):
    fb += U[0,1)*(rand_scalar/10), then roll along time by U[-10, 10).

    fb: (B, T, F). Per-sample noise scale and roll like the per-sample host
    version.
    """
    b, t, f = fb.shape
    k1, k2, k3 = jax.random.split(key, 3)
    noise = jax.random.uniform(k1, (b, t, f), fb.dtype)
    scale = jax.random.uniform(k2, (b, 1, 1), fb.dtype) / 10.0
    fb = fb + noise * scale
    shift = jax.random.randint(k3, (b,), -roll_max, roll_max)
    pos = jnp.arange(t)
    idx = (pos[None, :] - shift[:, None]) % t
    return jnp.take_along_axis(fb, idx[:, :, None], axis=1)
