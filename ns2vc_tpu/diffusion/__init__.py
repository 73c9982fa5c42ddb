from ns2vc_tpu.diffusion.schedule import NoiseSchedule
from ns2vc_tpu.diffusion.samplers import (
    add_noise,
    ddpm_sample,
    ddim_sample,
    dpm_inverse,
    dpmpp_2m_sample,
    dpmpp_adaptive_sample,
    dpmpp_singlestep_sample,
    dynamic_thresholding,
    sample,
    thresholded_x0_fn,
    unipc_sample,
)
from ns2vc_tpu.diffusion.wrappers import model_wrapper

__all__ = [
    "model_wrapper",
    "NoiseSchedule",
    "add_noise",
    "ddpm_sample",
    "ddim_sample",
    "dpm_inverse",
    "dpmpp_2m_sample",
    "dpmpp_adaptive_sample",
    "dpmpp_singlestep_sample",
    "dynamic_thresholding",
    "sample",
    "thresholded_x0_fn",
    "unipc_sample",
]
