"""Diffusion samplers as single compiled `lax.scan` programs.

The reference drives every sampler step from Python with a host->device
round trip per NFE (model.py:556/579, sampler/dpm_solver.py:1185-1231,
sampler/uni_pc.py:590-672). Here each sampler is one jitted program:
schedule scalars are folded to constants on the host (float64) and the
entire NFE loop is a lax.scan — zero host synchronization, fully fusible
by XLA, and batched sampling is free.

All samplers consume an x0-prediction function `x0_fn(x, t_input)` where
`t_input` is the (possibly fractional) discrete-time label in [0, 1000)
(the reference trains x0-prediction, model.py:513-519, and its fast
samplers call the model with `(t_cont - 1/N) * N`, dpm_solver.py:272-280).

Math re-derived from:
- DDPM ancestral: reference model.py:504-561;
- DDIM (eta configurable): reference model.py:563-603;
- DPM-Solver++ multistep order 2 ('dpmsolver' variant):
  reference sampler/dpm_solver.py:547-592, 796-853, 1185-1231;
- UniPC bh2 order 2 multistep predictor-corrector:
  reference sampler/uni_pc.py:472-590 (order-2 rho solves done in
  closed form on the host — no linalg in the loop).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ns2vc_tpu.diffusion.schedule import NoiseSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddpm_sample(x0_fn: DenoiseFn, x_T: jnp.ndarray, schedule: NoiseSchedule,
                rng: jax.Array) -> jnp.ndarray:
    """Ancestral sampling over all T steps (reference p_sample_loop,
    model.py:535-561)."""
    n = schedule.num_timesteps
    c1 = jnp.asarray(schedule.posterior_mean_coef1, jnp.float32)
    c2 = jnp.asarray(schedule.posterior_mean_coef2, jnp.float32)
    logvar = jnp.asarray(schedule.posterior_log_variance_clipped, jnp.float32)

    def body(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        t_b = jnp.full((x.shape[0],), t, jnp.float32)
        x0 = x0_fn(x, t_b)
        mean = c1[t].astype(x.dtype) * x0 + c2[t].astype(x.dtype) * x
        noise = jax.random.normal(sub, x.shape, x.dtype)
        sigma = jnp.where(t > 0, jnp.exp(0.5 * logvar[t]), 0.0)
        x = mean + sigma.astype(x.dtype) * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), jnp.arange(n - 1, -1, -1))
    return x


def ddim_sample(x0_fn: DenoiseFn, x_T: jnp.ndarray, schedule: NoiseSchedule,
                steps: int, rng: jax.Array | None = None,
                eta: float = 0.0) -> jnp.ndarray:
    """DDIM (reference ddim_sample, model.py:563-603; default eta=0)."""
    n = schedule.num_timesteps
    times = np.trunc(np.linspace(-1.0, n - 1, steps + 1)).astype(np.int64)
    pairs = list(zip(times[::-1][:-1], times[::-1][1:]))  # (t, t_next)
    acp = schedule.alphas_cumprod
    sr = schedule.sqrt_recip_alphas_cumprod
    srm1 = schedule.sqrt_recipm1_alphas_cumprod

    # per-step constants (host float64 -> f32)
    cs = []
    for t, tn in pairs:
        if tn < 0:
            cs.append((float(t), 1.0, 0.0, 0.0, 0.0, 0.0))
            continue
        alpha, alpha_next = acp[t], acp[tn]
        sigma = eta * np.sqrt((1 - alpha / alpha_next)
                              * (1 - alpha_next) / (1 - alpha))
        c = np.sqrt(1 - alpha_next - sigma ** 2)
        cs.append((float(t), np.sqrt(alpha_next), c, sigma, sr[t], srm1[t]))
    consts = jnp.asarray(np.asarray(cs, np.float32))  # (steps, 6)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def body(carry, c):
        x, key = carry
        t = c[0]
        sqrt_an, cn, sigma, srt, srm1t = (c[i].astype(x.dtype)
                                          for i in range(1, 6))
        x0 = x0_fn(x, jnp.full((x.shape[0],), t))
        # final step folds srm1t to 0 and discards pred_noise via the
        # select below; guard the division so no non-finite intermediate
        # is ever produced (jax_debug_nans / future vjp safety)
        pred_noise = (srt * x - x0) / jnp.maximum(srm1t, 1e-20)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x_next = x0 * sqrt_an + cn * pred_noise + sigma * noise
        # final step (t_next < 0): x = x0
        x_next = jnp.where(sqrt_an == 1.0, x0, x_next)
        return (x_next, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), consts)
    return x


def _fast_sampler_consts(schedule: NoiseSchedule, steps: int,
                         t_start: float | None = None,
                         t_end: float | None = None):
    """Shared time grid + marginals for DPM-Solver++/UniPC (host float64).
    t_start/t_end override the default [T, 1/N] sampling range — an
    ascending grid (t_start < t_end) runs the ODE forward (`inverse`)."""
    ts = schedule.time_uniform_steps(steps, t_start, t_end)  # (steps+1,)
    lam = schedule.marginal_lambda(ts)
    log_alpha = schedule.marginal_log_alpha(ts)
    alpha = np.exp(log_alpha)
    sigma = schedule.marginal_std(ts)
    t_input = schedule.model_input_time(ts)
    return ts, lam, alpha, sigma, t_input


def dynamic_thresholding(x0: jnp.ndarray, ratio: float = 0.995,
                         max_val: float = 1.0) -> jnp.ndarray:
    """Imagen-style dynamic thresholding of an x0 prediction (reference
    dpm_solver.py:416-426): clamp each sample to its |x0| `ratio`-quantile
    (floored at max_val) and rescale into [-1, 1]. Wrap it around an x0_fn
    via `thresholded_x0_fn` for the dpmsolver++ `correcting_x0_fn="dynamic_
    thresholding"` option (dpm_solver.py:372-383)."""
    s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1).astype(jnp.float32),
                     ratio, axis=1)
    s = jnp.maximum(s, max_val).reshape((-1,) + (1,) * (x0.ndim - 1))
    s = s.astype(x0.dtype)
    return jnp.clip(x0, -s, s) / s


def thresholded_x0_fn(x0_fn: DenoiseFn, ratio: float = 0.995,
                      max_val: float = 1.0) -> DenoiseFn:
    """x0_fn -> x0_fn with dynamic thresholding applied to every
    prediction (the reference threads this through correcting_x0_fn at
    every model_fn call, dpm_solver.py:433-443)."""
    def fn(x, t):
        return dynamic_thresholding(x0_fn(x, t), ratio, max_val)
    return fn


def add_noise(schedule: NoiseSchedule, x: jnp.ndarray, t: float,
              noise: jnp.ndarray) -> jnp.ndarray:
    """x_t = alpha_t x + sigma_t noise at continuous time t
    (reference dpm_solver.py:1012-1030)."""
    a = float(schedule.marginal_alpha(t))
    s = float(schedule.marginal_std(t))
    return a * x + s * noise


def dpmpp_2m_sample(x0_fn: DenoiseFn, x_T: jnp.ndarray,
                    schedule: NoiseSchedule, steps: int = 40,
                    order: int = 2, t_start: float | None = None,
                    t_end: float | None = None) -> jnp.ndarray:
    """DPM-Solver++ multistep (orders 1-3), time_uniform, 'dpmsolver'
    variant (reference defaults at model.py:620-653; order-3 math from
    sampler/dpm_solver.py:855-904). steps NFE total.

    Matches the reference driver at every step count: for steps < 10 the
    final updates lower their order (reference dpm_solver.py:1196-1200),
    handled here by an unrolled driver; steps >= 10 run at constant order
    through one lax.scan after the warm-up. An ascending t range
    (t_start < t_end) integrates the ODE forward — see `dpm_inverse`."""
    assert order in (1, 2, 3)
    assert steps >= order
    _, lam, alpha, sigma, t_in = _fast_sampler_consts(schedule, steps,
                                                      t_start, t_end)
    h = lam[1:] - lam[:-1]                                # h_i for update i+1
    sig_ratio = sigma[1:] / sigma[:-1]
    phi_1 = np.expm1(-h)
    aphi1 = alpha[1:] * phi_1
    aphi2 = alpha[1:] * (phi_1 / h + 1.0)
    aphi3 = alpha[1:] * ((phi_1 / h + 1.0) / h - 0.5)

    def eval_m(x, i):
        return x0_fn(x, jnp.full((x.shape[0],), np.float32(t_in[i])))

    def first_update(x, m0, i):
        # order 1 (dpm_solver.py:547-592, dpmsolver++); python-float
        # scalars are weak-typed: bf16 inputs stay bf16
        return float(sig_ratio[i]) * x - float(aphi1[i]) * m0

    def second_update(x, m0, m1, i):
        r0 = h[i - 1] / h[i]
        d = (m0 - m1) / float(r0)
        return float(sig_ratio[i]) * x - float(aphi1[i]) * (m0 + 0.5 * d)

    def third_update(x, m0, m1, m2, i):
        r0 = float(h[i - 1] / h[i])
        r1 = float(h[i - 2] / h[i])
        d1_0 = (m0 - m1) / r0
        d1_1 = (m1 - m2) / r1
        d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
        d2 = (d1_0 - d1_1) / (r0 + r1)
        return (float(sig_ratio[i]) * x - float(aphi1[i]) * m0
                + float(aphi2[i]) * d1 - float(aphi3[i]) * d2)

    if steps < 10:
        # unrolled driver with the reference's lower_order_final tail
        # (dpm_solver.py:1196-1200: step_order = min(order, steps+1-step))
        x = x_T
        m0 = eval_m(x, 0)
        m1 = m2 = m0
        for step in range(1, steps + 1):
            i = step - 1
            k = step if step < order else min(order, steps + 1 - step)
            if k == 1:
                x = first_update(x, m0, i)
            elif k == 2:
                x = second_update(x, m0, m1, i)
            else:
                x = third_update(x, m0, m1, m2, i)
            if step < steps:
                m2, m1, m0 = m1, m0, eval_m(x, step)
        return x

    x = x_T
    m0 = eval_m(x, 0)
    x = first_update(x, m0, 0)
    m1, m0 = m0, eval_m(x, 1)

    # scan covers updates to ts[j] for j in [order, steps-1] (h-index j-1),
    # each followed by a model eval at j; the final update to ts[steps]
    # (h-index steps-1) runs outside the scan with no trailing eval
    if order == 1:
        idx = np.arange(1, steps - 1)
        consts = jnp.asarray(np.stack(
            [sig_ratio[idx], aphi1[idx], t_in[idx + 1]], axis=1
        ).astype(np.float32))

        def body1(carry, c):
            x, m0 = carry
            sr, ap, ti = (c[i].astype(x.dtype) for i in range(3))
            x = sr * x - ap * m0
            return (x, x0_fn(x, jnp.full((x.shape[0],), ti))), None

        (x, m0), _ = jax.lax.scan(body1, (x, m0), consts)
        return first_update(x, m0, steps - 1)

    if order == 3:
        # one order-2 warm-up step (update to ts[2]) before the order-3 scan
        x = second_update(x, m0, m1, 1)
        m2, m1, m0 = m1, m0, eval_m(x, 2)
        idx = np.arange(2, steps - 1)
        r0s = h[idx - 1] / h[idx]
        r1s = h[idx - 2] / h[idx]
        consts = jnp.asarray(np.stack(
            [sig_ratio[idx], aphi1[idx], aphi2[idx], aphi3[idx],
             1.0 / r0s, 1.0 / r1s, r0s / (r0s + r1s), 1.0 / (r0s + r1s),
             t_in[idx + 1]], axis=1).astype(np.float32))

        def body3(carry, c):
            x, m0, m1, m2 = carry
            (sr, ap1, ap2, ap3, inv_r0, inv_r1, w01, inv_r01,
             ti) = (c[i].astype(x.dtype) for i in range(9))
            d1_0 = inv_r0 * (m0 - m1)
            d1_1 = inv_r1 * (m1 - m2)
            d1 = d1_0 + w01 * (d1_0 - d1_1)
            d2 = inv_r01 * (d1_0 - d1_1)
            x = sr * x - ap1 * m0 + ap2 * d1 - ap3 * d2
            m_new = x0_fn(x, jnp.full((x.shape[0],), ti))
            return (x, m_new, m0, m1), None

        (x, m0, m1, m2), _ = jax.lax.scan(body3, (x, m0, m1, m2), consts)
        return third_update(x, m0, m1, m2, steps - 1)

    idx = np.arange(1, steps - 1)
    r0s = h[idx - 1] / h[idx]
    consts = jnp.asarray(np.stack(
        [sig_ratio[idx], aphi1[idx], 1.0 / r0s, t_in[idx + 1]],
        axis=1).astype(np.float32))

    def body2(carry, c):
        x, m0, m1 = carry
        sr, ap, inv_r0, ti = (c[i].astype(x.dtype) for i in range(4))
        d = inv_r0 * (m0 - m1)
        x = sr * x - ap * (m0 + 0.5 * d)
        m_new = x0_fn(x, jnp.full((x.shape[0],), ti))
        return (x, m_new, m0), None

    (x, m0, m1), _ = jax.lax.scan(body2, (x, m0, m1), consts)
    return second_update(x, m0, m1, steps - 1)


def unipc_sample(x0_fn: DenoiseFn, x_T: jnp.ndarray, schedule: NoiseSchedule,
                 steps: int = 30, order: int = 2,
                 variant: str = "bh2") -> jnp.ndarray:
    """UniPC multistep predictor-corrector, orders 1-3, predict_x0, all
    three reference variants:
    - 'bh2' (default, B_h = expm1(hh)) and 'bh1' (B_h = hh):
      reference sampler/uni_pc.py:471-590 (the order-k rho systems are
      solved on the host, no linalg in the loop);
    - 'vary_coeff': reference sampler/uni_pc.py:369-469 (the C-matrix
      inverses and h_phi_k series collapse to per-step scalar weights on
      the host — the update has the same algebraic shape as bh).

    Follows the reference driver exactly: low-order warm-up, order-k body
    with corrector, and lower_order_final tail (the last k-1 updates drop
    to orders k-1..1; the final update runs without corrector,
    uni_pc.py:636-644). steps NFE total."""
    assert order in (1, 2, 3)
    assert variant in ("bh2", "bh1", "vary_coeff")
    assert steps >= order + 1
    _, lam, alpha, sigma, t_in = _fast_sampler_consts(schedule, steps)
    h = lam[1:] - lam[:-1]
    hh = -h                                        # predict_x0
    h_phi_1 = np.expm1(hh)
    sig_ratio = sigma[1:] / sigma[:-1]
    aphi = alpha[1:] * h_phi_1

    def rks(i, k):
        """[r_1, ..., r_{k-1}] for the update with h-index i:
        r_j = (lambda_{i-j} - lambda_i) / h_i (uni_pc.py:486-494,
        with lambda_prev_0 = lam[i])."""
        return [float((lam[i - j] - lam[i]) / h[i]) for j in range(1, k)]

    def step_weights(i, k):
        """Per-step scalar weights (wp (k-1,), wc (k-1,), wt, scale) such
        that the order-k update with h-index i is
            x_  = sig_ratio*x - aphi*m0
            x_p = x_ - scale * sum_j wp[j] * D1s[j]          (predictor)
            x   = x_ - scale * (sum_j wc[j] * D1s[j]
                                + wt * (m(x_p) - m0))        (corrector)
        with D1s[j] = (m_j - m0) / r_j."""
        hh_i = float(hh[i])
        if variant in ("bh1", "bh2"):
            # b_m sequence (uni_pc.py:506-522); bh1: B_h = hh (:511)
            B = hh_i if variant == "bh1" else float(np.expm1(hh_i))
            b = []
            h_phi_k = np.expm1(hh_i) / hh_i - 1.0
            fact = 1
            for m in range(1, k + 1):
                b.append(h_phi_k * fact / B)
                fact *= m + 1
                h_phi_k = h_phi_k / hh_i - 1.0 / fact
            b = np.asarray(b)
            r = np.asarray(rks(i, k) + [1.0])
            R = np.stack([r ** p for p in range(k)])
            rho_c = np.array([0.5]) if k == 1 else np.linalg.solve(R, b)
            if k <= 1:
                wp = np.zeros(0)
            elif k == 2:   # simplified order-2 predictor (uni_pc.py:531-533)
                wp = np.array([0.5])
            else:
                wp = np.linalg.solve(R[:-1, :-1], b[:-1])
            return wp, rho_c[:-1], float(rho_c[-1]), float(alpha[i + 1] * B)
        # vary_coeff (uni_pc.py:369-469): C[a, j] = r_a^j / (j+1)!,
        # A_p = C[:-1,:-1]^-1, A_c = C^-1, combined over the h_phi_k series
        K = k
        r = np.asarray(rks(i, K) + [1.0])
        fact = np.cumprod(np.arange(2, K + 2))            # (j+1)! for j>=1
        C = np.stack([r ** j / (fact[j - 1] if j else 1.0)
                      for j in range(K)], axis=1)
        hps = []                                          # h_phi_ks[0..K]
        h_phi_k = np.expm1(hh_i)
        f = 1
        for m in range(1, K + 2):
            hps.append(h_phi_k)
            h_phi_k = h_phi_k / hh_i - 1.0 / f
            f *= m + 1
        A_c = np.linalg.inv(C)
        if K >= 2:
            A_p = np.linalg.inv(C[:-1, :-1])
            wp = sum(hps[kk + 1] * A_p[kk] for kk in range(K - 1))
            wc = sum(hps[kk + 1] * A_c[kk][:-1] for kk in range(K - 1))
        else:
            wp = wc = np.zeros(0)
        k_last = K - 2 if K >= 2 else 0   # reference loop-variable quirk
        wt = float(hps[K] * A_c[k_last][-1])              # (uni_pc.py:466-468)
        return wp, wc, wt, float(alpha[i + 1])

    def eval_m(x, i):
        return x0_fn(x, jnp.full((x.shape[0],), np.float32(t_in[i])))

    def d1s(i, k, m0, m1, m2):
        r = rks(i, k)
        out = [(m1 - m0) / r[0]]
        if k >= 3:
            out.append((m2 - m0) / r[1])
        return out

    def update(x, i, k, m0, m1, m2, use_corrector):
        """One multistep update with h-index i at order k."""
        wp, wc, wt, scale = step_weights(i, k)
        x_ = float(sig_ratio[i]) * x - float(aphi[i]) * m0
        ds = d1s(i, k, m0, m1, m2) if k >= 2 else []
        x_t = x_
        for j in range(len(ds)):
            x_t = x_t - scale * float(wp[j]) * ds[j]
        if not use_corrector:
            return x_t, None
        m_t = eval_m(x_t, i + 1)
        corr = wt * (m_t - m0)
        for j in range(len(ds)):
            corr = corr + float(wc[j]) * ds[j]
        return x_ - scale * corr, m_t

    x = x_T
    m0 = eval_m(x, 0)
    m1 = m2 = m0
    # warm-up: updates 1..order-1 at increasing orders, with corrector
    hi = 0
    for k in range(1, order):
        x, m_t = update(x, hi, k, m0, m1, m2, use_corrector=True)
        m2, m1, m0 = m1, m0, m_t
        hi += 1

    # homogeneous body: order `order` with corrector, h-index
    # hi .. steps-1-(order-1)-1 ... the tail lowers order
    # (lower_order_final): update with h-index steps-1-j runs at order
    # min(order, j+1); the final update (j=0) skips the corrector.
    body_end = steps - order  # h-indices [hi, body_end) run at full order
    if body_end > hi:
        idx = np.arange(hi, body_end)
        n_r = order - 1
        rows = []
        for i in idx:
            wp, wc, wt, scale = step_weights(i, order)
            rows.append([sig_ratio[i], aphi[i], scale, t_in[i + 1],
                         *rks(i, order), *wp, *wc, wt])
        consts = jnp.asarray(np.asarray(rows, np.float32))

        def body(carry, c):
            x, m0, m1, m2 = carry
            sr, ap, scale, ti = (c[i].astype(x.dtype) for i in range(4))
            r = [c[4 + j].astype(x.dtype) for j in range(n_r)]
            p = [c[4 + n_r + j].astype(x.dtype) for j in range(n_r)]
            cc = [c[4 + 2 * n_r + j].astype(x.dtype) for j in range(n_r)]
            wt = c[4 + 3 * n_r].astype(x.dtype)
            ds = [(m1 - m0) / r[0]] if n_r >= 1 else []
            if order >= 3:
                ds.append((m2 - m0) / r[1])
            x_ = sr * x - ap * m0
            x_p = x_
            for j in range(n_r):
                x_p = x_p - scale * p[j] * ds[j]
            m_t = x0_fn(x_p, jnp.full((x.shape[0],), ti))
            corr = wt * (m_t - m0)
            for j in range(n_r):
                corr = corr + cc[j] * ds[j]
            x = x_ - scale * corr
            return (x, m_t, m0, m1), None

        # NS2VC_SCAN_UNROLL>1 unrolls the homogeneous body (opt-in, for
        # the B=1 latency experiment — round-5 measured entry in
        # CLAUDE.md; default 1 = no change)
        unroll = int(os.environ.get("NS2VC_SCAN_UNROLL", "1"))
        (x, m0, m1, m2), _ = jax.lax.scan(body, (x, m0, m1, m2), consts,
                                          unroll=max(1, unroll))
        hi = body_end

    # tail: orders order-1 .. 1 (with corrector except the very last)
    for i in range(hi, steps):
        k = min(order, steps - i)
        x, m_t = update(x, i, k, m0, m1, m2,
                        use_corrector=(i < steps - 1))
        if m_t is not None:
            m2, m1, m0 = m1, m0, m_t
    return x


def _eval_at(x0_fn: DenoiseFn, schedule: NoiseSchedule, x, t_cont: float):
    """Model eval at a continuous time (host float) -> discrete label."""
    label = np.float32(schedule.model_input_time(t_cont))
    return x0_fn(x, jnp.full((x.shape[0],), label))


def _singlestep_update(x0_fn: DenoiseFn, schedule: NoiseSchedule, x,
                       s: float, t: float, order: int,
                       r1: float | None, r2: float | None,
                       solver_type: str = "dpmsolver",
                       model_s=None, model_s1=None,
                       return_intermediate: bool = False):
    """One dpmsolver++ singlestep block from time s to t at the given
    order (reference dpm_solver.py:547-592 order 1, :594-673 order 2,
    :675-794 order 3; only the '++' algorithm branch, both 'dpmsolver'
    and 'taylor' solver types). All schedule scalars fold to host floats."""
    lam_s, lam_t = (float(schedule.marginal_lambda(u)) for u in (s, t))
    h = lam_t - lam_s
    sig_s, sig_t = (float(schedule.marginal_std(u)) for u in (s, t))
    alpha_t = float(schedule.marginal_alpha(t))
    phi_1 = float(np.expm1(-h))
    if model_s is None:
        model_s = _eval_at(x0_fn, schedule, x, s)

    if order == 1:
        x_t = (sig_t / sig_s) * x - (alpha_t * phi_1) * model_s
        return (x_t, {"model_s": model_s}) if return_intermediate else x_t

    # reference defaults: r1=0.5 (order 2, :613), r1=1/3 (order 3, :697)
    r1 = (0.5 if order == 2 else 1.0 / 3.0) if r1 is None else float(r1)
    s1 = float(schedule.inverse_lambda(lam_s + r1 * h))
    sig_s1 = float(schedule.marginal_std(s1))
    alpha_s1 = float(schedule.marginal_alpha(s1))
    phi_11 = float(np.expm1(-r1 * h))
    if model_s1 is None:
        x_s1 = (sig_s1 / sig_s) * x - (alpha_s1 * phi_11) * model_s
        model_s1 = _eval_at(x0_fn, schedule, x_s1, s1)

    if order == 2:
        base = (sig_t / sig_s) * x - (alpha_t * phi_1) * model_s
        if solver_type == "dpmsolver":
            x_t = base - (0.5 / r1) * (alpha_t * phi_1) * (model_s1 - model_s)
        else:  # taylor
            x_t = base + (1.0 / r1) * (alpha_t * (phi_1 / h + 1.0)) \
                * (model_s1 - model_s)
        inter = {"model_s": model_s, "model_s1": model_s1}
        return (x_t, inter) if return_intermediate else x_t

    assert order == 3
    r2 = 2.0 / 3.0 if r2 is None else float(r2)
    s2 = float(schedule.inverse_lambda(lam_s + r2 * h))
    sig_s2 = float(schedule.marginal_std(s2))
    alpha_s2 = float(schedule.marginal_alpha(s2))
    phi_12 = float(np.expm1(-r2 * h))
    phi_22 = float(np.expm1(-r2 * h) / (r2 * h) + 1.0)
    phi_2 = phi_1 / h + 1.0
    phi_3 = phi_2 / h - 0.5
    x_s2 = ((sig_s2 / sig_s) * x - (alpha_s2 * phi_12) * model_s
            + (r2 / r1) * (alpha_s2 * phi_22) * (model_s1 - model_s))
    model_s2 = _eval_at(x0_fn, schedule, x_s2, s2)
    if solver_type == "dpmsolver":
        x_t = ((sig_t / sig_s) * x - (alpha_t * phi_1) * model_s
               + (1.0 / r2) * (alpha_t * phi_2) * (model_s2 - model_s))
    else:  # taylor
        d1_0 = (1.0 / r1) * (model_s1 - model_s)
        d1_1 = (1.0 / r2) * (model_s2 - model_s)
        d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
        d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
        x_t = ((sig_t / sig_s) * x - (alpha_t * phi_1) * model_s
               + (alpha_t * phi_2) * d1 - (alpha_t * phi_3) * d2)
    inter = {"model_s": model_s, "model_s1": model_s1}
    return (x_t, inter) if return_intermediate else x_t


def dpmpp_singlestep_sample(x0_fn: DenoiseFn, x_T: jnp.ndarray,
                            schedule: NoiseSchedule, steps: int = 20,
                            order: int = 2,
                            solver_type: str = "dpmsolver",
                            fixed: bool = False,
                            t_start: float | None = None,
                            t_end: float | None = None) -> jnp.ndarray:
    """Singlestep DPM-Solver++ ("DPM-Solver-fast"): `steps` NFE split into
    order-k blocks per the reference schedule (dpm_solver.py:482-539),
    each block one singlestep update with intra-block r1/r2 taken from the
    time_uniform inner grid (dpm_solver.py:1214-1228). `fixed` selects the
    'singlestep_fixed' method (steps//order equal blocks)."""
    assert order in (1, 2, 3)
    if fixed:
        k_blocks = steps // order
        orders = [order] * k_blocks
        outer = schedule.time_uniform_steps(k_blocks, t_start, t_end)
    else:
        # order split (dpm_solver.py:517-535)
        if order == 3:
            k_blocks = steps // 3 + 1
            orders = ([3] * (k_blocks - 2) + [2, 1] if steps % 3 == 0 else
                      [3] * (k_blocks - 1) + [1] if steps % 3 == 1 else
                      [3] * (k_blocks - 1) + [2])
        elif order == 2:
            orders = [2] * (steps // 2) + ([1] if steps % 2 else [])
        else:
            orders = [1] * steps
        ts = schedule.time_uniform_steps(steps, t_start, t_end)
        outer = ts[np.cumsum([0] + orders)]

    x = x_T
    for i, k in enumerate(orders):
        s, t = float(outer[i]), float(outer[i + 1])
        inner = np.linspace(s, t, k + 1)
        lam_in = schedule.marginal_lambda(inner)
        hh = lam_in[-1] - lam_in[0]
        r1 = float((lam_in[1] - lam_in[0]) / hh) if k >= 2 else None
        r2 = float((lam_in[2] - lam_in[0]) / hh) if k >= 3 else None
        x = _singlestep_update(x0_fn, schedule, x, s, t, k, r1, r2,
                               solver_type)
    return x


def dpmpp_adaptive_sample(x0_fn: DenoiseFn, x_T: jnp.ndarray,
                          schedule: NoiseSchedule, order: int = 2,
                          h_init: float = 0.05, atol: float = 0.0078,
                          rtol: float = 0.05, theta: float = 0.9,
                          t_err: float = 1e-5,
                          solver_type: str = "dpmsolver",
                          t_start: float | None = None,
                          t_end: float | None = None) -> jnp.ndarray:
    """Adaptive-step singlestep DPM-Solver++ (reference
    dpm_solver.py:956-1010): embedded lower/higher-order pair, step
    accepted when the scaled error E <= 1, logSNR step h adapted by
    theta * E^(-1/order). Host-driven control loop (the error test is a
    scalar decision — the reference is eager here too); the model evals
    inside reuse whatever jit the caller baked into x0_fn."""
    assert order in (2, 3)
    t_0 = 1.0 / schedule.num_timesteps if t_end is None else t_end
    s = schedule.T if t_start is None else t_start
    lam_s = float(schedule.marginal_lambda(s))
    lam_0 = float(schedule.marginal_lambda(t_0))
    h = h_init
    x = x_prev = x_T
    r1, r2 = (0.5, None) if order == 2 else (1.0 / 3.0, 2.0 / 3.0)
    while abs(s - t_0) > t_err:
        t = float(schedule.inverse_lambda(lam_s + h))
        if order == 2:
            x_lower, inter = _singlestep_update(
                x0_fn, schedule, x, s, t, 1, None, None, solver_type,
                return_intermediate=True)
            x_higher = _singlestep_update(
                x0_fn, schedule, x, s, t, 2, r1, None, solver_type,
                model_s=inter["model_s"])
        else:
            x_lower, inter = _singlestep_update(
                x0_fn, schedule, x, s, t, 2, r1, None, solver_type,
                return_intermediate=True)
            x_higher = _singlestep_update(
                x0_fn, schedule, x, s, t, 3, r1, r2, solver_type,
                model_s=inter["model_s"], model_s1=inter["model_s1"])
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower),
                                                     jnp.abs(x_prev)))
        err = ((x_higher - x_lower) / delta).reshape(x_T.shape[0], -1)
        e = float(jnp.max(jnp.sqrt(jnp.mean(err.astype(jnp.float32) ** 2,
                                            axis=-1))))
        if e <= 1.0:
            x, x_prev, s = x_higher, x_lower, t
            lam_s = float(schedule.marginal_lambda(s))
        h = min(theta * h * e ** (-1.0 / order), lam_0 - lam_s)
    return x


def dpm_inverse(x0_fn: DenoiseFn, x0: jnp.ndarray, schedule: NoiseSchedule,
                steps: int = 20, order: int = 2) -> jnp.ndarray:
    """Encode a sample x_{1/N} -> x_T by running the diffusion ODE forward
    (reference DPM_Solver.inverse, dpm_solver.py:1032-1045): the multistep
    solver over the ascending time grid [1/N, T]."""
    return dpmpp_2m_sample(x0_fn, x0, schedule, steps=steps, order=order,
                           t_start=1.0 / schedule.num_timesteps,
                           t_end=schedule.T)


def sample(method: str, x0_fn: DenoiseFn, x_T: jnp.ndarray,
           schedule: NoiseSchedule, steps: int | None = None,
           rng: jax.Array | None = None, order: int = 2,
           variant: str = "bh2") -> jnp.ndarray:
    """Dispatch matching reference NaturalSpeech2.sample's method names and
    default step counts / orders (model.py:605-687). `variant` selects the
    UniPC flavor (bh2/bh1/vary_coeff, uni_pc.py:303-310)."""
    if method == "ddpm":
        return ddpm_sample(x0_fn, x_T, schedule,
                           rng if rng is not None else jax.random.PRNGKey(0))
    if method == "ddim":
        return ddim_sample(x0_fn, x_T, schedule, steps or 100, rng)
    if method == "dpmsolver":
        return dpmpp_2m_sample(x0_fn, x_T, schedule, steps or 40, order=order)
    if method == "unipc":
        return unipc_sample(x0_fn, x_T, schedule, steps or 30, order=order,
                            variant=variant)
    raise ValueError(f"unknown sample method {method!r}")
