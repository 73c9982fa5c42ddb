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


def _bcast(b):
    """scalar const -> () f32 array for clean scan stacking."""
    return np.asarray(b, np.float32)


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
        pred_noise = (srt * x - x0) / srm1t
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
                    schedule: NoiseSchedule, steps: int = 40) -> jnp.ndarray:
    """DPM-Solver++ multistep order 2, time_uniform, 'dpmsolver' variant
    (reference defaults at model.py:620-653). steps NFE total."""
    assert steps >= 3
    _, lam, alpha, sigma, t_in = _fast_sampler_consts(schedule, steps)
    h = lam[1:] - lam[:-1]                                # h_i for update i+1
    sig_ratio = sigma[1:] / sigma[:-1]
    aphi = alpha[1:] * np.expm1(-h)
    r0 = np.concatenate([[1.0], h[:-1] / h[1:]])          # r0 for update i>=2

    def eval_m(x, i):
        return x0_fn(x, jnp.full((x.shape[0],), np.float32(t_in[i])))

    x = x_T
    m0 = eval_m(x, 0)
    # first update: order 1 (dpm_solver.py:547-592, dpmsolver++).
    # python-float scalars are weak-typed: bf16 inputs stay bf16.
    x = float(sig_ratio[0]) * x - float(aphi[0]) * m0
    m1, m0 = m0, eval_m(x, 1)

    # middle updates 2..steps-1: order 2 + model eval
    idx = np.arange(2, steps)  # updates to ts[2..steps-1]
    consts = jnp.asarray(np.stack([
        sig_ratio[1:-1], aphi[1:-1], 1.0 / r0[1:-1],
        t_in[2:steps]], axis=1).astype(np.float32))

    def body(carry, c):
        x, m0, m1 = carry
        sr, ap, inv_r0, ti = (c[i].astype(x.dtype) for i in range(4))
        d = inv_r0 * (m0 - m1)
        x = sr * x - ap * (m0 + 0.5 * d)
        m_new = x0_fn(x, jnp.full((x.shape[0],), ti))
        return (x, m_new, m0), None

    (x, m0, m1), _ = jax.lax.scan(body, (x, m0, m1), consts)

    # final update: order 2, no trailing model eval (steps >= 10 keeps
    # order 2 at the end — dpm_solver.py:1196-1200)
    d = (m0 - m1) / float(r0[-1])
    x = float(sig_ratio[-1]) * x - float(aphi[-1]) * (m0 + 0.5 * d)
    return x


def unipc_sample(x0_fn: DenoiseFn, x_T: jnp.ndarray, schedule: NoiseSchedule,
                 steps: int = 30) -> jnp.ndarray:
    """UniPC variant bh2, order 2 multistep with corrector, predict_x0
    (reference defaults at model.py:654-687; math from
    sampler/uni_pc.py:472-590). steps NFE total."""
    assert steps >= 3
    _, lam, alpha, sigma, t_in = _fast_sampler_consts(schedule, steps)
    h = lam[1:] - lam[:-1]
    hh = -h                                        # predict_x0
    h_phi_1 = np.expm1(hh)
    b_h = np.expm1(hh)                             # bh2: B_h = expm1(hh)
    b1 = (h_phi_1 / hh - 1.0) / b_h
    b2 = 2.0 * ((h_phi_1 / hh - 1.0) / hh - 0.5) / b_h
    sig_ratio = sigma[1:] / sigma[:-1]
    aphi = alpha[1:] * h_phi_1
    a_bh = alpha[1:] * b_h
    # r0 for update i (i >= 2): (lambda_{i-2} - lambda_{i-1}) / h_i
    # (index 0 is a placeholder — update 1 is order 1 and never reads it)
    r0 = np.concatenate([[0.5], (lam[:-2] - lam[1:-1]) / h[1:]])
    # order-2 corrector rhos: [[1, 1], [r0, 1]] @ rho = [b1, b2]
    rho1 = (b1 - b2) / (1.0 - r0)
    rho2 = b1 - rho1

    def eval_m(x, i):
        return x0_fn(x, jnp.full((x.shape[0],), np.float32(t_in[i])))

    x = x_T
    m0 = eval_m(x, 0)
    # update 1: order 1 with corrector (rho_c = [0.5]); python-float
    # scalars are weak-typed so bf16 inputs stay bf16
    x_ = float(sig_ratio[0]) * x - float(aphi[0]) * m0
    m_t = eval_m(x_, 1)  # corrector model eval at the predictor point (= x_)
    x = x_ - float(a_bh[0]) * 0.5 * (m_t - m0)
    m1, m0 = m0, m_t

    # updates 2..steps-1: order 2 predictor + corrector
    consts = jnp.asarray(np.stack([
        sig_ratio[1:-1], aphi[1:-1], a_bh[1:-1], 1.0 / r0[1:-1],
        rho1[1:-1], rho2[1:-1], t_in[2:steps]], axis=1).astype(np.float32))

    def body(carry, c):
        x, m0, m1 = carry
        sr, ap, abh, inv_r0, p1, p2, ti = (c[i].astype(x.dtype)
                                           for i in range(7))
        d1_0 = inv_r0 * (m1 - m0)
        x_ = sr * x - ap * m0
        x_p = x_ - abh * 0.5 * d1_0                      # predictor (rho_p=0.5)
        m_t = x0_fn(x_p, jnp.full((x.shape[0],), ti))
        x = x_ - abh * (p1 * d1_0 + p2 * (m_t - m0))     # corrector
        return (x, m_t, m0), None

    (x, m0, m1), _ = jax.lax.scan(body, (x, m0, m1), consts)

    # final update (step == steps): order 1, no corrector
    # (uni_pc.py:636-644: step_order = min(order, steps + 1 - step) = 1)
    x = float(sig_ratio[-1]) * x - float(aphi[-1]) * m0
    return x


def sample(method: str, x0_fn: DenoiseFn, x_T: jnp.ndarray,
           schedule: NoiseSchedule, steps: int | None = None,
           rng: jax.Array | None = None) -> jnp.ndarray:
    """Dispatch matching reference NaturalSpeech2.sample's method names and
    default step counts (model.py:605-687)."""
    if method == "ddpm":
        return ddpm_sample(x0_fn, x_T, schedule,
                           rng if rng is not None else jax.random.PRNGKey(0))
    if method == "ddim":
        return ddim_sample(x0_fn, x_T, schedule, steps or 100, rng)
    if method == "dpmsolver":
        return dpmpp_2m_sample(x0_fn, x_T, schedule, steps or 40)
    if method == "unipc":
        return unipc_sample(x0_fn, x_T, schedule, steps or 30)
    raise ValueError(f"unknown sample method {method!r}")
