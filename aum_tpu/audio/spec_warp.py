"""EPIC-SOUNDS SpecAugment: sparse-image time warp + mean-fill masks, in JAX.

Re-implements /root/reference/src/epic_sounds/epic_data/spec_augment.py:

- `sparse_image_warp`: polyharmonic-spline (order 2, thin-plate
  phi(r^2) = 0.5 r^2 log r^2) interpolation of control-point flows to a dense
  flow field, then bilinear dense_image_warp (:7-344);
- `time_warp`: warps a random time point on the center mel row by a random
  shift in [-W, W) (:346-363);
- `freq_mask` / `time_mask`: masks whose fill value is the spectrogram MEAN
  (not zero) (:366-405), widths drawn like the torch version (randrange);
- `combined_transforms`: time_warp -> freq_mask x2 -> time_mask x2
  (:408-412) with cfg's T_MASK / F_MASK / T_WARP.

All functions are batched (leading B axis) and take explicit PRNG keys.
Spectrogram layout here is (B, T, F) (time-major like the rest of aum_tpu);
the reference operates on (1, F, T) — axes are translated accordingly
(its "rows" = mel bins, "spec_len" = time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _phi2(r2):
    return 0.5 * r2 * jnp.log(jnp.maximum(r2, 1e-10))


def interpolate_spline_flow(
    train_points: jax.Array,  # (n, 2) control points (y, x)
    train_values: jax.Array,  # (n, 2) flows at control points
    query_points: jax.Array,  # (m, 2)
    order: int = 2,
) -> jax.Array:
    """Polyharmonic spline interpolation (spec_augment.py:64-117)."""
    assert order == 2
    n = train_points.shape[0]
    c = train_points.astype(jnp.float32)
    f = train_values.astype(jnp.float32)

    d2 = jnp.sum((c[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    mat_a = _phi2(d2)                                  # (n, n)
    mat_b = jnp.concatenate([c, jnp.ones((n, 1))], axis=1)  # (n, 3)
    lhs = jnp.block([[mat_a, mat_b],
                     [mat_b.T, jnp.zeros((3, 3))]])
    rhs = jnp.concatenate([f, jnp.zeros((3, 2))], axis=0)
    # The torch version jitters the zero block to keep `solve` happy; lstsq
    # handles the (potentially singular) system directly.
    sol = jnp.linalg.lstsq(lhs, rhs)[0]
    w, v = sol[:n], sol[n:]

    q = query_points.astype(jnp.float32)
    d2q = jnp.sum((q[:, None, :] - c[None, :, :]) ** 2, axis=-1)  # (m, n)
    rbf = _phi2(d2q) @ w
    lin = jnp.concatenate([q, jnp.ones((q.shape[0], 1))], axis=1) @ v
    return rbf + lin


def dense_image_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear warp: output(y,x) = img(y - flow_y, x - flow_x).

    img: (H, W); flow: (H, W, 2) in (y, x) order (spec_augment.py:200-344).
    """
    h, wd = img.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(wd, dtype=jnp.float32), indexing="ij")
    qy = jnp.clip(gy - flow[..., 0], 0.0, h - 1.0)
    qx = jnp.clip(gx - flow[..., 1], 0.0, wd - 1.0)
    y0 = jnp.clip(jnp.floor(qy).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(qx).astype(jnp.int32), 0, wd - 2)
    wy = qy - y0
    wx = qx - x0
    tl = img[y0, x0]
    tr = img[y0, x0 + 1]
    bl = img[y0 + 1, x0]
    br = img[y0 + 1, x0 + 1]
    top = tl + wx * (tr - tl)
    bot = bl + wx * (br - bl)
    return top + wy * (bot - top)


def sparse_image_warp(
    img: jax.Array,             # (H, W)
    src_pts: jax.Array,         # (n, 2) (y, x)
    dst_pts: jax.Array,         # (n, 2)
) -> jax.Array:
    h, wd = img.shape
    flows = dst_pts.astype(jnp.float32) - src_pts.astype(jnp.float32)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(wd, dtype=jnp.float32), indexing="ij")
    query = jnp.stack([gy.ravel(), gx.ravel()], axis=1)
    dense = interpolate_spline_flow(dst_pts, flows, query).reshape(h, wd, 2)
    return dense_image_warp(img, dense)


def time_warp(key: jax.Array, spec: jax.Array, W: int = 5) -> jax.Array:
    """Batched EPIC time warp. spec: (B, T, F).

    Reference (:346-363): pick the *value* at a random time in [W, T-W) on
    the center mel row as the warp coordinate, move it by randrange(-W, W).
    (Using the row's value as a coordinate is faithfully reproduced — it is
    what the reference does, quirky as it is.)
    """
    if W <= 0:
        return spec
    b, t, f = spec.shape
    y = f // 2
    k1, k2 = jax.random.split(key)
    pt_idx = jax.random.randint(k1, (b,), W, t - W)
    point_to_warp = jax.vmap(lambda s, i: s[i, y])(spec, pt_idx)
    dist = jax.random.randint(k2, (b,), -W, W).astype(jnp.float32)

    def warp_one(img_tf, p, d):
        # reference layout is (F, T): rows=mel, cols=time.
        img = img_tf.T  # (F, T)
        src = jnp.stack([jnp.asarray(y, jnp.float32), p])[None, :]
        dst = jnp.stack([jnp.asarray(y, jnp.float32), p + d])[None, :]
        return sparse_image_warp(img, src, dst).T

    return jax.vmap(warp_one)(spec, point_to_warp.astype(jnp.float32), dist)


def _masked(key, spec, param, axis):
    """One mean-fill mask along `axis` (1=time, 2=freq) per batch element.

    Matches freq_mask/time_mask (:366-405): width w ~ randrange(0, param),
    start ~ randrange(0, L - w), masked range [start, end) with
    end ~ randrange(start, start + w); fill = per-sample spectrogram mean.
    """
    b = spec.shape[0]
    length = spec.shape[axis]
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.randint(k1, (b,), 0, param)
    start = jax.random.randint(k2, (b,), 0, length - w)
    end = start + jnp.where(
        w > 0, jax.random.randint(k3, (b,), 0, jnp.maximum(w, 1)), 0)
    pos = jnp.arange(length)
    m = (pos[None, :] >= start[:, None]) & (pos[None, :] < end[:, None])
    shape = [b, 1, 1]
    shape[axis] = length
    m = m.reshape(shape)
    mean = jnp.mean(spec, axis=(1, 2), keepdims=True)
    return jnp.where(m, mean, spec)


def freq_mask(key, spec, F=27, num_masks=1):
    for k in jax.random.split(key, num_masks):
        spec = _masked(k, spec, F, axis=2)
    return spec


def time_mask(key, spec, T=25, num_masks=1):
    for k in jax.random.split(key, num_masks):
        spec = _masked(k, spec, T, axis=1)
    return spec


def combined_transforms(
    key: jax.Array,
    spec: jax.Array,
    t_mask: int = 192,
    f_mask: int = 48,
    t_warp: int = 5,
) -> jax.Array:
    """time_warp -> freq_mask x2 -> time_mask x2 (spec_augment.py:408-412)."""
    k1, k2, k3 = jax.random.split(key, 3)
    spec = time_warp(k1, spec, W=t_warp)
    spec = freq_mask(k2, spec, F=f_mask, num_masks=2)
    spec = time_mask(k3, spec, T=t_mask, num_masks=2)
    return spec
