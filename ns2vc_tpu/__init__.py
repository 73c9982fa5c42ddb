"""NS2VC-TPU: a TPU-native (JAX/XLA/Pallas) zero-shot voice-conversion framework.

A from-scratch rebuild of the capabilities of adelacvg/NS2VC (NaturalSpeech 2
for voice conversion with contentvec content features and a Vocos vocoder),
designed TPU-first:

- all compute-path code is JAX (jit/pjit over `jax.sharding.Mesh`es),
- fixed-shape, mask-disciplined batching (XLA-friendly),
- diffusion samplers compiled as single `lax.scan` programs (no per-step
  host round trips),
- bf16 matmuls on the MXU, remat on UNet block boundaries,
- orbax checkpoints with optimizer state (fixing the reference's
  model-only checkpoints, reference model.py:812-815).

Layer map (mirrors SURVEY.md section 7.1):
    audio/      jitted DSP: resample, log-mel, iSTFT, F0 (dio/stonemask), slicer
    features/   contentvec (HuBERT) content encoder + fairseq weight converter
    models/     encoders, UNet1D denoiser, diffusion core, vocoders
    ops/        attention (incl. Pallas kernels), masking, conv helpers
    diffusion/  noise schedule + DDPM/DDIM/DPM-Solver++/UniPC scan samplers
    data/       preprocess driver, dataset, fixed-shape collate
    train/      pjit trainer, optax, orbax, tensorboard
    infer/      Svc-equivalent API + slicing/crossfade CLI
    parallel/   device mesh + sharding rules
    native/     C++ host ops (DIO F0) with ctypes bindings
"""

__version__ = "0.1.0"
