"""Model-parameterization and guidance wrappers for the samplers.

The reference's ``model_wrapper`` (/root/reference/sampler/dpm_solver.py:
170-334) converts any of the four diffusion parameterizations —
``noise`` / ``x_start`` / ``v`` / ``score`` — plus three guidance modes —
``uncond`` / ``classifier`` / ``classifier-free`` — into a continuous-time
*noise*-prediction function for DPM-Solver.  Our samplers instead consume
an x0-prediction function ``x0_fn(x, t_input)`` with ``t_input`` the
(possibly fractional) discrete-time label in [0, 1000)
(samplers.py:10-13).  This wrapper therefore composes the reference's
type -> noise conversion (dpm_solver.py:282-298) and guidance combination
(dpm_solver.py:309-330) with the data-prediction step DPM-Solver++ applies
internally (dpm_solver.py:414-424):

    x0 = (x - sigma_t * eps) / alpha_t

so the result plugs straight into ``dpmpp_2m_sample`` / ``unipc_sample`` /
``ddim_sample`` and numerically matches the reference chain
``model_wrapper(...)`` |> ``DPM_Solver(algorithm_type='dpmsolver++')``.

Guidance modes (dpm_solver.py:207-236):

- ``uncond``           — ``model(x, t_input, **model_kwargs)``.
- ``classifier``       — classifier guidance (Dhariwal & Nichol 2021):
  ``eps_guided = eps - s * sigma_t * grad_x log p(cond | x_t)`` with the
  gradient taken through ``classifier_fn`` by ``jax.grad`` (the reference
  uses torch.autograd, dpm_solver.py:300-307).
- ``classifier-free``  — CFG (Ho & Salimans 2022): the model is called on
  a doubled batch ``[uncond_cond; cond]`` exactly like the reference's
  ``torch.cat`` dispatch (dpm_solver.py:326-330), and
  ``eps = eps_uncond + s * (eps_cond - eps_uncond)``.

All marginal coefficients are evaluated *inside* the traced function with
``jnp.interp`` over the same (t_i, log alpha_i) grid the host-side
``NoiseSchedule.marginal_log_alpha`` uses (schedule.py:53-58), so wrapped
models stay jittable and lax.scan-compatible.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ns2vc_tpu.diffusion.schedule import NoiseSchedule

MODEL_TYPES = ("noise", "x_start", "v", "score")
GUIDANCE_TYPES = ("uncond", "classifier", "classifier-free")


def _marginal_coeffs(schedule: NoiseSchedule, t_input: jnp.ndarray,
                     ndim: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(alpha_t, sigma_t) at the discrete-time label ``t_input``, traced.

    Mirrors NoiseScheduleVP.marginal_log_mean_coeff's piecewise-linear
    interpolation of log alpha over t_i = (i+1)/N (dpm_solver.py:127-133)
    with the label -> continuous-time inverse of model_input_time
    (dpm_solver.py:271-280): t = t_input / N + 1 / N.
    """
    n = schedule.num_timesteps
    t_grid = jnp.asarray(schedule.t_array, jnp.float32)
    la_grid = jnp.asarray(schedule.log_alpha_array, jnp.float32)
    t_cont = (t_input.astype(jnp.float32) + 1.0) / n
    log_alpha = jnp.interp(t_cont, t_grid, la_grid)
    alpha = jnp.exp(log_alpha)
    sigma = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2.0 * log_alpha), 1e-20))
    shape = (-1,) + (1,) * (ndim - 1)
    return alpha.reshape(shape), sigma.reshape(shape)


def model_wrapper(
    model: Callable,
    schedule: NoiseSchedule,
    model_type: str = "noise",
    model_kwargs: dict | None = None,
    guidance_type: str = "uncond",
    condition: jnp.ndarray | None = None,
    unconditional_condition: jnp.ndarray | None = None,
    guidance_scale: float = 1.0,
    classifier_fn: Callable | None = None,
    classifier_kwargs: dict | None = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Wrap a raw diffusion model into the samplers' x0_fn contract.

    Args mirror the reference model_wrapper (dpm_solver.py:170-269) with
    one contract change: the returned function takes the *discrete-time
    label* ``t_input`` (what our samplers pass their x0_fn) rather than
    continuous time, and returns the x0 prediction rather than noise.

    ``model`` signatures (identical to the reference):
      - uncond / classifier:  ``model(x, t_input, **model_kwargs)``
      - classifier-free:      ``model(x, t_input, cond, **model_kwargs)``
    ``classifier_fn(x, t_input, condition, **classifier_kwargs)`` returns
    per-example log-probabilities; its summed gradient w.r.t. ``x`` drives
    classifier guidance.
    """
    if model_type not in MODEL_TYPES:
        raise ValueError(f"model_type must be one of {MODEL_TYPES}")
    if guidance_type not in GUIDANCE_TYPES:
        raise ValueError(f"guidance_type must be one of {GUIDANCE_TYPES}")
    if guidance_type == "classifier" and classifier_fn is None:
        raise ValueError("classifier guidance needs classifier_fn")
    mkw = dict(model_kwargs or {})
    ckw = dict(classifier_kwargs or {})

    def to_noise(output, x, t_input):
        """raw model output -> noise prediction (dpm_solver.py:288-298)."""
        if model_type == "noise":
            return output
        alpha, sigma = _marginal_coeffs(schedule, t_input, x.ndim)
        alpha = alpha.astype(x.dtype)
        sigma = sigma.astype(x.dtype)
        if model_type == "x_start":
            return (x - alpha * output) / sigma
        if model_type == "v":
            return alpha * output + sigma * x
        return -sigma * output  # score

    def noise_pred(x, t_input, cond=None):
        if cond is None:
            output = model(x, t_input, **mkw)
        else:
            output = model(x, t_input, cond, **mkw)
        return to_noise(output, x, t_input)

    def to_x0(eps, x, t_input):
        """noise -> x0, the DPM-Solver++ data-prediction step
        (dpm_solver.py:414-424)."""
        alpha, sigma = _marginal_coeffs(schedule, t_input, x.ndim)
        return (x - sigma.astype(x.dtype) * eps) / alpha.astype(x.dtype)

    def x0_fn(x, t_input):
        if guidance_type == "uncond":
            if model_type == "x_start":
                # direct: skip the eps round trip (exact, fewer ops)
                return model(x, t_input, **mkw)
            return to_x0(noise_pred(x, t_input), x, t_input)
        if guidance_type == "classifier":
            log_prob = lambda xx: jnp.sum(
                classifier_fn(xx, t_input, condition, **ckw))
            cond_grad = jax.grad(log_prob)(x)
            _, sigma = _marginal_coeffs(schedule, t_input, x.ndim)
            eps = noise_pred(x, t_input)
            eps = eps - guidance_scale * sigma.astype(x.dtype) * cond_grad
            return to_x0(eps, x, t_input)
        # classifier-free
        if guidance_scale == 1.0 or unconditional_condition is None:
            eps = noise_pred(x, t_input, cond=condition)
            return to_x0(eps, x, t_input)
        # doubled-batch dispatch like the reference (dpm_solver.py:326-330)
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t_input, t_input], axis=0)
        c_in = jnp.concatenate([unconditional_condition, condition], axis=0)
        eps_both = noise_pred(x_in, t_in, cond=c_in)
        eps_uncond, eps_cond = jnp.split(eps_both, 2, axis=0)
        eps = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
        return to_x0(eps, x, t_input)

    return x0_fn
