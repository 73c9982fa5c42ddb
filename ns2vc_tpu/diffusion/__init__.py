from ns2vc_tpu.diffusion.schedule import NoiseSchedule
from ns2vc_tpu.diffusion.samplers import (
    ddpm_sample,
    ddim_sample,
    dpmpp_2m_sample,
    unipc_sample,
    sample,
)

__all__ = [
    "NoiseSchedule",
    "ddpm_sample",
    "ddim_sample",
    "dpmpp_2m_sample",
    "unipc_sample",
    "sample",
]
