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


def _fast_sampler_consts(schedule: NoiseSchedule, steps: int):
    """Shared time grid + marginals for DPM-Solver++/UniPC (host float64)."""
    ts = schedule.time_uniform_steps(steps)             # (steps+1,)
    lam = schedule.marginal_lambda(ts)
    log_alpha = schedule.marginal_log_alpha(ts)
    alpha = np.exp(log_alpha)
    sigma = schedule.marginal_std(ts)
    t_input = schedule.model_input_time(ts)
    return ts, lam, alpha, sigma, t_input


def dpmpp_2m_sample(x0_fn: DenoiseFn, x_T: jnp.ndarray,
                    schedule: NoiseSchedule, steps: int = 40,
                    order: int = 2) -> jnp.ndarray:
    """DPM-Solver++ multistep (orders 1-3), time_uniform, 'dpmsolver'
    variant (reference defaults at model.py:620-653; order-3 math from
    sampler/dpm_solver.py:855-904). steps NFE total.

    Matches the reference driver for steps >= 10 (constant order after the
    low-order warm-up; reference dpm_solver.py:1196-1200 only lowers the
    final orders when steps < 10)."""
    assert order in (1, 2, 3)
    assert steps >= order + 1
    if order == 3:
        assert steps >= 10, "order-3 tail lowering (steps<10) not implemented"
    _, lam, alpha, sigma, t_in = _fast_sampler_consts(schedule, steps)
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

        (x, m0, m1, m2), _ = jax.lax.scan(body, (x, m0, m1, m2), consts)
        hi = body_end

    # tail: orders order-1 .. 1 (with corrector except the very last)
    for i in range(hi, steps):
        k = min(order, steps - i)
        x, m_t = update(x, i, k, m0, m1, m2,
                        use_corrector=(i < steps - 1))
        if m_t is not None:
            m2, m1, m0 = m1, m0, m_t
    return x


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
