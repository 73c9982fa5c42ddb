"""NaturalSpeech2-style diffusion VC core: conditioning bundle, UNet wrapper,
training objective, and jitted sampling glue.

Behavioral parity targets:
- PreModel: reference Pre_model (model.py:328-376) — attention-pools the
  reference mel into a speaker vector g, encodes prompt and content;
- DiffusionEncoder: reference Diffusion_Encoder (model.py:378-415) —
  concat noisy mel with encoded content -> UNet with prompt cross-attention;
- NaturalSpeech2: reference model.py:439-745 — x0-prediction DDPM with
  linear betas, SNR-weighted MSE on x0, and ddpm/ddim/dpmsolver/unipc
  sampling (here: single-lax.scan samplers with the step-invariant
  conditioning computed once, preserving reference model.py:632/667).

Batch convention (fixed shapes, mask-disciplined):
    c      (B, T, 256)   contentvec, frame-expanded
    refer  (B, Tp, 100)  reference log-mel (the prompt)
    f0     (B, T)        interpolated F0      [carried for the TTS branch]
    uv     (B, T)        voicing mask         [carried for the TTS branch]
    spec   (B, T, 100)   target log-mel
    lengths, refer_lengths (B,)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ns2vc_tpu.config import Config
from ns2vc_tpu.diffusion.samplers import sample as run_sampler
from ns2vc_tpu.diffusion.schedule import NoiseSchedule
from ns2vc_tpu.models.encoders import (
    F0Predictor, PhoneEncoder, PromptEncoder, TextTimeEmbedding,
)
from ns2vc_tpu.models.unet import UNet1DConditionModel
from ns2vc_tpu.ops.masking import sequence_mask


class PreModel(nn.Module):
    """Bundles speaker pooling + prompt/content encoders
    (reference model.py:328-376)."""

    cfg: Config

    @nn.compact
    def __call__(self, c, refer, c_mask, refer_mask, deterministic=True,
                 f0=None, uv=None, norm_rng=None, auto_predict_f0=True):
        """Returns (content, prompt, lf0, lf0_pred); the F0 terms are None
        unless cfg.f0_predictor.enabled (the reference's dormant TTS-branch
        design, model.py:334-358)."""
        from ns2vc_tpu.ops.sequence import f0_to_coarse_jnp, normalize_f0_jnp

        pe = self.cfg.phoneme_encoder
        pr = self.cfg.prompt_encoder
        # NOTE: the reference pools the *padded* refer mel without a mask
        # (model.py:344) — mirrored here.
        g = TextTimeEmbedding(pr.in_channels, pr.in_channels, 1,
                              name="ref_enc")(refer)
        prompt = PromptEncoder(
            in_channels=pr.in_channels, hidden_channels=pr.hidden_channels,
            out_channels=pr.out_channels, n_layers=pr.n_layers,
            p_dropout=pr.p_dropout, n_heads=pr.n_heads,
            ffn_kernel=pr.ffn_kernel, name="prompt_encoder")(
            refer, refer_mask, deterministic=deterministic)
        content = PhoneEncoder(
            in_channels=pe.in_channels, hidden_channels=pe.hidden_channels,
            out_channels=pe.out_channels, n_layers=pe.n_layers,
            p_dropout=pe.p_dropout, n_heads=pe.n_heads,
            ffn_kernel=pe.ffn_kernel, name="phoneme_encoder")(
            c, c_mask, g, deterministic=deterministic)

        lf0 = lf0_pred = None
        fp = self.cfg.f0_predictor
        if fp.enabled and f0 is not None:
            # log-mel-scale F0 target (reference model.py:349)
            lf0 = (2595.0 * jnp.log10(1.0 + f0[..., None] / 700.0)) / 500.0
            norm_lf0 = normalize_f0_jnp(
                lf0, uv if uv is not None else (f0 > 0).astype(lf0.dtype),
                norm_rng)
            lf0_pred = F0Predictor(
                in_channels=fp.in_channels,
                hidden_channels=fp.hidden_channels,
                out_channels=fp.out_channels,
                attention_layers=fp.attention_layers, n_heads=fp.n_heads,
                p_dropout=fp.p_dropout, name="f0_predictor")(
                content, prompt, norm_lf0, c_mask, refer_mask,
                deterministic=deterministic)
            # quantized-F0 embedding added to content (model.py:353-354);
            # ground-truth f0 at train, predicted at inference
            if deterministic and auto_predict_f0:
                f0_for_emb = 700.0 * (10.0 ** (lf0_pred[..., 0]
                                               * 500.0 / 2595.0) - 1.0)
            else:
                f0_for_emb = f0
            coarse = f0_to_coarse_jnp(f0_for_emb)
            content = content + nn.Embed(256, pe.out_channels,
                                         name="f0_emb")(coarse)
        return content, prompt, lf0, lf0_pred


class DiffusionEncoder(nn.Module):
    """Concat noisy mel + content -> conditional UNet
    (reference model.py:378-415)."""

    cfg: Config
    remat: bool = False
    remat_policy: str = "all"

    def _unet(self):
        d = self.cfg.diffusion_encoder
        return UNet1DConditionModel(
            in_channels=d.in_channels + d.hidden_channels,
            out_channels=d.out_channels,
            block_out_channels=d.block_out_channels,
            layers_per_block=d.layers_per_block,
            norm_num_groups=d.norm_num_groups,
            cross_attention_dim=d.hidden_channels,
            num_attention_heads=d.n_heads,
            addition_embed_heads=d.addition_embed_heads,
            remat=self.remat,
            remat_policy=self.remat_policy,
            name="unet")

    @nn.compact
    def __call__(self, x, content, prompt, prompt_mask, t,
                 cross_kv=None, aug_emb=None, precompute_kv=False):
        d = self.cfg.diffusion_encoder
        if precompute_kv:
            dummy = jnp.zeros(
                (prompt.shape[0], 8, d.in_channels + d.hidden_channels),
                prompt.dtype)
            return self._unet()(dummy, jnp.zeros((prompt.shape[0],)), prompt,
                                precompute_kv=True)
        h = jnp.concatenate([x, content], axis=-1)
        return self._unet()(h, t, prompt, encoder_attention_mask=prompt_mask,
                            cross_kv=cross_kv, aug_emb=aug_emb)


class NaturalSpeech2(nn.Module):
    """Diffusion core (reference model.py:439-745). Methods are selected via
    flax's `method=` mechanism: `__call__` = training loss,
    `encode` = step-invariant conditioning, `denoise` = one x0 prediction."""

    cfg: Config
    remat: bool = False
    remat_policy: str = "all"

    def setup(self):
        self.pre_model = PreModel(self.cfg, name="pre_model")
        self.diff_model = DiffusionEncoder(self.cfg, remat=self.remat,
                                           remat_policy=self.remat_policy,
                                           name="diff_model")
        self.schedule = NoiseSchedule(self.cfg.train.timesteps)

    def encode(self, c, refer, c_mask, refer_mask, deterministic=True,
               f0=None, uv=None, auto_predict_f0=True):
        content, prompt, _, _ = self.pre_model(
            c, refer, c_mask, refer_mask, deterministic=deterministic,
            f0=f0, uv=uv, auto_predict_f0=auto_predict_f0)
        return content, prompt

    def denoise(self, x, content, prompt, prompt_mask, t,
                cross_kv=None, aug_emb=None):
        """x0-prediction at (possibly fractional) discrete label t
        (reference sample_fun, model.py:520-526). cross_kv/aug_emb are the
        optional step-invariant conditioning from
        `precompute_conditioning`."""
        return self.diff_model(x, content, prompt, prompt_mask, t,
                               cross_kv=cross_kv, aug_emb=aug_emb)

    def precompute_conditioning(self, prompt):
        """Pooled-prompt embedding + every cross-attention K/V — constant
        across sampler steps, hoisted out of the scan."""
        return self.diff_model(None, None, prompt, None, None,
                               precompute_kv=True)

    def __call__(self, batch: dict[str, Any], rng: jax.Array,
                 deterministic: bool = False):
        """Training objective (reference model.py:706-734): SNR-weighted
        MSE on x0 over masked mels. Returns (loss, aux)."""
        spec = batch["spec"]
        b, t_len, _ = spec.shape
        c_mask = sequence_mask(batch["lengths"], t_len)
        refer_mask = sequence_mask(batch["refer_lengths"],
                                   batch["refer"].shape[1])
        x_mask = c_mask[..., None].astype(spec.dtype)
        x_start = spec * x_mask

        t_rng, n_rng, f0_rng = jax.random.split(rng, 3)
        content, prompt, lf0, lf0_pred = self.pre_model(
            batch["c"], batch["refer"], c_mask, refer_mask,
            deterministic=deterministic, f0=batch.get("f0"),
            uv=batch.get("uv"), norm_rng=f0_rng, auto_predict_f0=False)
        t = jax.random.randint(t_rng, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(n_rng, x_start.shape, x_start.dtype) * x_mask

        sqrt_acp = jnp.asarray(self.schedule.sqrt_alphas_cumprod,
                               spec.dtype)[t][:, None, None]
        sqrt_1macp = jnp.asarray(self.schedule.sqrt_one_minus_alphas_cumprod,
                                 spec.dtype)[t][:, None, None]
        x_t = sqrt_acp * x_start + sqrt_1macp * noise

        model_out = self.diff_model(x_t, content, prompt, refer_mask,
                                    t.astype(jnp.float32))

        # loss in float32 regardless of compute dtype
        model_out = model_out.astype(jnp.float32)
        x_start = x_start.astype(jnp.float32)
        loss = (model_out - x_start) ** 2
        loss = jnp.mean(loss.reshape(b, -1), axis=-1)
        snr = self.schedule.snr
        if self.cfg.train.min_snr_loss_weight:
            # reference min_snr_loss_weight option (model.py:446-449,
            # 493-498): clamp the SNR weight at gamma
            snr = np.minimum(snr, self.cfg.train.min_snr_gamma)
        weight = jnp.asarray(snr, jnp.float32)[t]
        loss_diff = jnp.mean(loss * weight)
        loss_f0 = 0.0
        if lf0_pred is not None:
            # L1 on normalized log-F0 (reference model.py:355/728, commented)
            loss_f0 = jnp.mean(jnp.abs(lf0_pred.astype(jnp.float32)
                                       - lf0.astype(jnp.float32)))
        total = loss_diff + loss_f0
        aux = {"loss_diff": loss_diff, "loss_f0": loss_f0,
               "pred": model_out, "target": x_start}
        return total, aux


def make_x0_fn(model: NaturalSpeech2, params, content, prompt, prompt_mask,
               cached=None):
    """Bind step-invariant conditioning into a sampler-ready x0 function
    (conditioning computed once per utterance — reference model.py:632/667;
    `cached=(aug_emb, cross_kv)` additionally hoists the prompt's pooled
    embedding and cross-attention K/V out of every step)."""
    aug_emb, cross_kv = cached if cached is not None else (None, None)

    def x0_fn(x, t):
        return model.apply(params, x, content, prompt, prompt_mask, t,
                           cross_kv=cross_kv, aug_emb=aug_emb,
                           method=NaturalSpeech2.denoise)
    return x0_fn


def generate_mel(model: NaturalSpeech2, params, c, refer, lengths,
                 refer_lengths, rng: jax.Array, method: str = "unipc",
                 steps: Optional[int] = None,
                 compute_dtype=None, f0=None, uv=None,
                 auto_predict_f0: bool = True, order: int = 2) -> jnp.ndarray:
    """Full sampling path: encode conditioning once, run one compiled
    sampler scan, return (B, T, 100) log-mel in float32
    (reference NaturalSpeech2.sample, model.py:605-696, minus vocoder).
    compute_dtype=jnp.bfloat16 runs the whole path in bf16 (TPU-native)."""
    from ns2vc_tpu.utils.precision import cast_floating

    if compute_dtype is not None:
        params = cast_floating(params, compute_dtype)
        c = c.astype(compute_dtype)
        refer = refer.astype(compute_dtype)
    t_len = c.shape[1]
    c_mask = sequence_mask(lengths, t_len)
    refer_mask = sequence_mask(refer_lengths, refer.shape[1])
    content, prompt = model.apply(params, c, refer, c_mask, refer_mask,
                                  f0=f0, uv=uv,
                                  auto_predict_f0=auto_predict_f0,
                                  method=NaturalSpeech2.encode)
    cached = model.apply(params, prompt,
                         method=NaturalSpeech2.precompute_conditioning)
    x0_fn = make_x0_fn(model, params, content, prompt, refer_mask,
                       cached=cached)
    noise_rng, sample_rng = jax.random.split(rng)
    x_T = jax.random.normal(
        noise_rng,
        (c.shape[0], t_len, model.cfg.diffusion_encoder.out_channels),
        compute_dtype or jnp.float32)
    schedule = NoiseSchedule(model.cfg.train.timesteps)
    mel = run_sampler(method, x0_fn, x_T, schedule, steps, sample_rng,
                      order=order)
    return mel.astype(jnp.float32)
