"""Chunked-matmul ("SSD"/Mamba-2-style) reformulation probe (VERDICT r3 #2).

Question: can the Mamba-1 selective scan be recast as chunked matmuls so the
work moves from the (saturated) VPU onto the (idle) MXU? This script
implements the only algebraically-available form for Mamba-1 — the
*factored* semiseparable form — exactly, validates it against the jnp
oracle (ops/scan_ref.py; semantics per
/root/reference/vim-mamba_ssm/mamba_ssm/ops/selective_scan_interface.py:86-152),
and measures it on the real chip against the production Pallas kernel with
the calibrated chained-iteration harness. The analysis + numbers live in
docs/ROOFLINE.md "The chunked-matmul (SSD) route".

Math. For one channel d, h_t = exp(dt_t a_n) h_{t-1} + dt_t B_t[n] u_t and
y_t = Σ_n C_t[n] h_t[n]. With S_t = Σ_{k≤t} dt_k (per channel!),

    y_t = Σ_{j≤t} [Σ_n C_t[n] B_j[n] exp(a_n (S_t − S_j))] dt_j u_j.

Mamba-2's SSD factors exp out of the n-sum because its decay is a scalar
per head. Mamba-1's decay a_n = A[d,n] is per-(d,n), so the only
factorization is per (n, d):

    C~_t[n,d] = C_t[n] exp(a_n S_t),   B~_j[n,d] = B_j[n] exp(−a_n S_j)
    K[t,j,d]  = Σ_n C~_t[n,d] B~_j[n,d]          (an (L_c,N)@(N,L_c) matmul
                                                  batched per channel)
    y_t       = Σ_{j≤t} K[t,j] dt_j u_j  +  Σ_n C~_t[n] h_chunk_in[n]

with an exact inter-chunk state recurrence (stable: pure decays ≤ 1).
Note the two structural costs unique to Mamba-1: (1) C~/B~ are N·d-sized —
N× bigger than C/B, because the decay factor varies per channel; (2) the
exp(−a_n S_j) factor GROWS, so fp32 requires |a_n|·ΔS_chunk ≤ ~85
(per-chunk offset): a learned-parameter-dependent overflow hazard with no
static bound (dt is softplus-unbounded). bf16 is out entirely.

Usage:
  CPU check:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/ssd_probe.py check
  TPU timing: python scripts/ssd_probe.py time [L_c ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def ssd_factored_fwd(u, delta, A, Bm, Cm, D, z, delta_bias, lc=32):
    """One-direction selective scan in the factored chunked-matmul form.

    Exact (up to fp reassociation) for |A|·chunk-dt-sum within fp32 range.
    Shapes: u/delta (B,L,d), A (d,N), Bm/Cm (B,L,N), D (d,), z (B,L,d).
    """
    Bz, L, d = u.shape
    N = A.shape[1]
    pad = (-L) % lc
    if pad:
        # dt=0 on padding => decay 1, contribution 0: exactness preserved.
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)),
                        constant_values=-60.0)  # softplus(-60) ~ 0
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
        z = jnp.pad(z, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    nc = Lp // lc
    dt = jax.nn.softplus(delta + delta_bias)          # (B,Lp,d)
    uc = u.reshape(Bz, nc, lc, d)
    dtc = dt.reshape(Bz, nc, lc, d)
    Bc = Bm.reshape(Bz, nc, lc, N)
    Cc = Cm.reshape(Bz, nc, lc, N)
    S = jnp.cumsum(dtc, axis=2)                        # within-chunk cumsum
    E = jnp.einsum("bcld,dn->bclnd", S, A)             # a_n·S_t ≤ 0
    P = jnp.exp(E)                                     # decay factors ≤ 1
    Pinv = jnp.exp(-E)                                 # growth factors ≥ 1
    Ct = Cc[:, :, :, :, None] * P                      # (B,nc,lc,N,d) — N·d!
    Bt = Bc[:, :, :, :, None] * Pinv
    V = dtc * uc
    # K-build: the MXU step — batched (lc,N)@(N,lc) per (b, chunk, channel).
    K = jnp.einsum("bclnd,bcmnd->bclmd", Ct, Bt)
    K = jnp.where(jnp.tril(jnp.ones((lc, lc), bool))[None, None, :, :, None],
                  K, 0.0)
    y_intra = jnp.einsum("bclmd,bcmd->bcld", K, V)     # masked matvec
    # Inter-chunk carry (exact recurrence over nc chunks; all factors ≤ 1).
    G = jnp.einsum("bcmnd,bcmd->bcnd", Bt, V)          # Σ_j B~_j V_j
    chunk_decay = P[:, :, -1]                          # (B,nc,N,d)
    H_local = chunk_decay * G                          # chunk end state

    def carry(h, inp):
        h_loc, dec, ct = inp
        y_inter = jnp.einsum("blnd,bnd->bld", ct, h)
        return dec * h + h_loc, y_inter

    _, y_inter = jax.lax.scan(
        carry, jnp.zeros((Bz, N, d), jnp.float32),
        (H_local.transpose(1, 0, 2, 3), chunk_decay.transpose(1, 0, 2, 3),
         Ct.transpose(1, 0, 2, 3, 4)))
    y = (y_intra + y_inter.transpose(1, 0, 2, 3)).reshape(Bz, Lp, d)
    y = y + u * D
    y = y * jax.nn.silu(z)
    return y[:, :L]


def make_args(bsz, l, d, n, dt_scale=1.0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    return (jax.random.normal(ks[0], (bsz, l, d), dtype),
            jax.random.normal(ks[1], (bsz, l, d), dtype) * 0.5 * dt_scale
            - (3.0 if dt_scale < 1 else 0.0),
            -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.5),
            jax.random.normal(ks[3], (bsz, l, n), dtype),
            jax.random.normal(ks[4], (bsz, l, n), dtype),
            jax.random.normal(ks[5], (d,), jnp.float32),
            jax.random.normal(ks[6], (bsz, l, d), dtype),
            jax.random.normal(ks[7], (d,), jnp.float32) * 0.3)


def check():
    """Exactness vs the jnp oracle at range-safe dt (CPU)."""
    from aum_tpu.ops.scan_ref import selective_scan_ref

    u, delta, A, Bm, Cm, D, z, db = make_args(2, 96, 64, 16, dt_scale=0.3)
    ref = selective_scan_ref(u, delta, A, Bm, Cm, D, z, db,
                             delta_softplus=True)
    for lc in (16, 32, 96):
        got = ssd_factored_fwd(u, delta, A, Bm, Cm, D, z, db, lc=lc)
        err = float(jnp.max(jnp.abs(got - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        print(f"lc={lc}: max|Δ|={err:.3e} rel={rel:.3e}")
        assert rel < 2e-4, (lc, rel)
    print("ssd factored form EXACT vs oracle (range-safe dt)")


def time_tpu(lcs):
    from aum_tpu.ops import selective_scan
    from scripts.sweep_scan import timed

    bsz, l, d, n = 8, 513, 1536, 16
    args = make_args(bsz, l, d, n, dt_scale=0.3)
    # production one-direction kernel (fp32 streams for apples-to-apples)
    kfn = lambda *a: selective_scan(*a, delta_softplus=True, use_kernel=True)
    tk = timed(kfn, *args)
    print(f"kernel one-direction (B={bsz}, L={l}, D={d}, N={n}, fp32): "
          f"{tk*1e3:.2f} ms", flush=True)
    for lc in lcs:
        fn = lambda *a: ssd_factored_fwd(*a, lc=lc)
        try:
            t = timed(fn, *args)
            print(f"ssd factored lc={lc}: {t*1e3:.2f} ms "
                  f"({t/tk:.1f}x kernel)", flush=True)
        except Exception as e:  # noqa: BLE001 — probe records OOM etc.
            print(f"ssd factored lc={lc} FAILED: {str(e)[:200]}", flush=True)
    # isolated K-build einsum: lower bound for ANY XLA-expressible variant
    for lc in lcs:
        nc = -(-l // lc)
        x = bsz * nc * d
        ct = jax.random.normal(jax.random.PRNGKey(1), (x, lc, n))
        bt = jax.random.normal(jax.random.PRNGKey(2), (x, lc, n))
        fn = lambda a, b2: jnp.einsum("xln,xmn->xlm", a, b2)
        t = timed(fn, ct, bt)
        fl = 2 * x * lc * lc * n
        print(f"K-build einsum lc={lc}: {t*1e3:.2f} ms = "
              f"{fl/t/1e12:.2f} TFLOP/s achieved", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    else:
        time_tpu([int(v) for v in sys.argv[2:]] or [32, 104])
