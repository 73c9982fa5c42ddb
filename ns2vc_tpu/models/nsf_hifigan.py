"""NSF-HiFiGAN: source-filter HiFiGAN vocoder (the reference's alternate
44.1 kHz vocoder, nsf_hifigan/models.py:101-434, exercised by
test.py:165-192).

Components:
- SineGen / SourceModule: harmonic sine excitation from frame-rate F0 with
  per-harmonic random initial phase and phase-accurate upsampling
  (nsf_hifigan/models.py:101-213);
- Generator: mel conv_pre -> [ConvTranspose upsample + per-scale source
  injection + multi-receptive-field ResBlocks] -> conv_post -> tanh
  (nsf_hifigan/models.py:216-280);
- MultiPeriod/MultiScale discriminators + LSGAN/feature losses for
  training (nsf_hifigan/models.py:283-434).

Inference-path weight norms are folded at conversion time (the reference
calls remove_weight_norm before inference, models.py:23); training uses
plain convs (weight norm is an optimizer preconditioner the AdamW setup
does not rely on).

Layout is (B, T, C); transposed convs are expressed as lhs-dilated
`lax.conv_general_dilated` (XLA lowers both to the same MXU loops).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# source module
# ---------------------------------------------------------------------------

def _mod1_cumsum(x: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Fractional part of a running sum of (B, N, H), computed blockwise so
    float32 never accumulates a large magnitude (sin(2*pi*x) only needs
    x mod 1, and taking mod 1 at any intermediate point is exact)."""
    b, n, h = x.shape
    pad = (-n) % block
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    nb = xp.shape[1] // block
    blocks = xp.reshape(b, nb, block, h)
    local = jnp.cumsum(blocks, axis=2)
    totals = jnp.mod(local[:, :, -1, :], 1.0)
    offsets = jnp.mod(jnp.cumsum(totals, axis=1) - totals, 1.0)  # exclusive
    phase = jnp.mod(local + offsets[:, :, None, :], 1.0)
    return phase.reshape(b, nb * block, h)[:, :n]


def sine_source(f0: jnp.ndarray, upp: int, sampling_rate: int,
                harmonic_num: int, rng: jax.Array,
                sine_amp: float = 0.1) -> jnp.ndarray:
    """Frame-rate f0 (B, L) -> sample-rate harmonic sines (B, L*upp, H+1).

    TPU-first redesign of SineGen (nsf_hifigan/models.py:134-172): the
    reference accumulates an unwrapped float64 phase over the whole signal
    and re-derives wrap corrections from a linearly-interpolated copy; here
    the held-rate phase is accumulated directly with a blocked mod-1 cumsum
    (exact in float32 for arbitrarily long audio, no f64 needed). The only
    deviation is at frame boundaries, where the reference's interpolated
    phase shifts wrap positions by <1 sample — inaudible and within the
    estimator's own frame quantization."""
    b, l = f0.shape
    h = harmonic_num + 1
    harmonics = jnp.arange(1, h + 1, dtype=jnp.float32)
    rad = (f0.astype(jnp.float32)[..., None] * harmonics) / sampling_rate
    rad = rad % 1.0
    rand_ini = jax.random.uniform(rng, (b, h), dtype=jnp.float32)
    rand_ini = rand_ini.at[:, 0].set(0.0)
    rad = rad.at[:, 0, :].add(rand_ini)
    rad_up = jnp.repeat(rad, upp, axis=1)           # nearest upsample
    phase = _mod1_cumsum(rad_up)
    return jnp.sin(phase * (2 * np.pi)) * sine_amp


class SourceModuleHnNSF(nn.Module):
    """harmonics -> linear merge -> tanh (nsf_hifigan/models.py:175-213)."""

    sampling_rate: int
    harmonic_num: int = 8
    sine_amp: float = 0.1

    @nn.compact
    def __call__(self, f0: jnp.ndarray, upp: int, rng: jax.Array) -> jnp.ndarray:
        sines = sine_source(f0, upp, self.sampling_rate, self.harmonic_num,
                            rng, self.sine_amp)
        return jnp.tanh(nn.Dense(1, name="l_linear")(sines))


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def _conv_transpose(x, kernel, bias, stride, torch_padding):
    """torch ConvTranspose1d semantics via lhs-dilated conv.
    kernel (K, In, Out) already flipped for correlation."""
    k = kernel.shape[0]
    pad = k - 1 - torch_padding
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"))
    return y + bias


class ConvTranspose1D(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01),
            (self.kernel_size, x.shape[-1], self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return _conv_transpose(x, kernel, bias, self.stride,
                               (self.kernel_size - self.stride) // 2)


class ResBlock1(nn.Module):
    """[lrelu -> dilated conv -> lrelu -> conv] x3 with residuals
    (nsf_hifigan/models.py:37-75)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        name=f"convs1_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        name=f"convs2_{i}")(h)
            x = x + h
        return x


class ResBlock2(nn.Module):
    """[lrelu -> dilated conv] x2 with residuals
    (nsf_hifigan/models.py:78-100)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        name=f"convs_{i}")(h)
            x = x + h
        return x


class NSFHiFiGANGenerator(nn.Module):
    """mel (B, T, num_mels) + f0 (B, T) -> waveform (B, T*prod(upsample)).

    Defaults follow the community 44.1 kHz NSF-HiFiGAN config the
    reference loads (nsf_hifigan/models.py:216-246)."""

    num_mels: int = 128
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4, 4)
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    sampling_rate: int = 44100

    @nn.compact
    def __call__(self, mel: jnp.ndarray, f0: jnp.ndarray,
                 rng: jax.Array | None = None) -> jnp.ndarray:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        upp = int(np.prod(self.upsample_rates))
        source = SourceModuleHnNSF(self.sampling_rate, 8,
                                   name="m_source")(f0, upp, rng)  # (B,N,1)

        x = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME",
                    name="conv_pre")(mel)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        n_up = len(self.upsample_rates)
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1D(ch, k, u, name=f"ups_{i}")(x)
            if i + 1 < n_up:
                stride_f0 = int(np.prod(self.upsample_rates[i + 1:]))
                pad = stride_f0 // 2
                src = jax.lax.conv_general_dilated(
                    source,
                    self.param(f"noise_convs_{i}_kernel",
                               nn.initializers.normal(0.01),
                               (stride_f0 * 2, 1, ch)),
                    (stride_f0,), [(pad, pad)],
                    dimension_numbers=("NHC", "HIO", "NHC"))
                src = src + self.param(f"noise_convs_{i}_bias",
                                       nn.initializers.zeros, (ch,))
            else:
                src = nn.Dense(ch, name=f"noise_convs_{i}")(source)
            x = x + src
            xs = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                block = res_cls(ch, rk, tuple(rd),
                                name=f"resblocks_{i}_{j}")(x)
                xs = block if xs is None else xs + block
            x = xs / len(self.resblock_kernel_sizes)
        x = nn.leaky_relu(x)
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# discriminators + GAN losses (training side, nsf_hifigan/models.py:283-434)
# ---------------------------------------------------------------------------

class DiscriminatorP(nn.Module):
    """Period discriminator: fold waveform into (T/p, p) and run strided
    2D convs."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, t = x.shape
        pad = (-t) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(b, -1, self.period, 1)  # (B, T/p, p, 1)
        fmaps = []
        for i, ch in enumerate([32, 128, 512, 1024]):
            x = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=((2, 2), (0, 0)), name=f"convs_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmaps.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding=((2, 2), (0, 0)),
                    name="convs_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmaps.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(b, -1), fmaps


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped strided 1D convs."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b = x.shape[0]
        h = x[..., None]
        fmaps = []
        specs = [  # (ch, kernel, stride, groups)
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
            (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, g) in enumerate(specs):
            h = nn.Conv(ch, (k,), strides=(s,), padding="SAME",
                        feature_group_count=g if h.shape[-1] % g == 0 else 1,
                        name=f"convs_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmaps.append(h)
        h = nn.Conv(1, (3,), padding="SAME", name="conv_post")(h)
        fmaps.append(h)
        return h.reshape(b, -1), fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, name=f"disc_{p}")
            r, fr = d(y)
            g, fg = d(y_hat)
            outs_r.append(r); outs_g.append(g)
            fmaps_r.append(fr); fmaps_g.append(fg)
        return outs_r, outs_g, fmaps_r, fmaps_g


class MultiScaleDiscriminator(nn.Module):
    num_scales: int = 3

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i in range(self.num_scales):
            d = DiscriminatorS(name=f"disc_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            outs_r.append(r); outs_g.append(g)
            fmaps_r.append(fr); fmaps_g.append(fg)
            if i + 1 < self.num_scales:  # avg-pool 4/2/2 between scales
                y = jax.lax.reduce_window(
                    y, 0.0, jax.lax.add, (1, 4), (1, 2), "SAME") / 4.0
                y_hat = jax.lax.reduce_window(
                    y_hat, 0.0, jax.lax.add, (1, 4), (1, 2), "SAME") / 4.0
        return outs_r, outs_g, fmaps_r, fmaps_g


def feature_loss(fmaps_r, fmaps_g) -> jnp.ndarray:
    """L1 feature matching x2 (nsf_hifigan/models.py:391-398)."""
    loss = 0.0
    for fr, fg in zip(fmaps_r, fmaps_g):
        for r, g in zip(fr, fg):
            loss += jnp.mean(jnp.abs(r - g))
    return loss * 2.0


def discriminator_loss(outs_r, outs_g):
    """LSGAN D loss (nsf_hifigan/models.py:401-413)."""
    loss = 0.0
    for r, g in zip(outs_r, outs_g):
        loss += jnp.mean((1.0 - r) ** 2) + jnp.mean(g ** 2)
    return loss


def generator_loss(outs_g):
    """LSGAN G loss (nsf_hifigan/models.py:416-424)."""
    loss = 0.0
    for g in outs_g:
        loss += jnp.mean((1.0 - g) ** 2)
    return loss


def convert_nsf_hifigan(sd: dict, cfg: dict) -> dict:
    """Reference checkpoint (cp_dict['generator'], weight-normed) ->
    flax params with weight norm folded (models.py:15-24)."""
    from ns2vc_tpu.utils.convert_reference import _np

    def fold(p):
        if f"{p}.weight_g" in sd:
            g = _np(sd[f"{p}.weight_g"])
            v = _np(sd[f"{p}.weight_v"])
            axes = tuple(i for i in range(v.ndim) if i != 0)
            w = v * g / np.maximum(
                np.sqrt(np.sum(v * v, axis=axes, keepdims=True)), 1e-12)
        else:
            w = _np(sd[f"{p}.weight"])
        return w, _np(sd[f"{p}.bias"])

    def conv(p):
        w, b = fold(p)  # (O, I, K)
        return {"kernel": w.transpose(2, 1, 0), "bias": b}

    out: dict = {"conv_pre": conv("conv_pre"), "conv_post": conv("conv_post")}
    out["m_source"] = {"l_linear": {
        "kernel": _np(sd["m_source.l_linear.weight"]).T,
        "bias": _np(sd["m_source.l_linear.bias"])}}
    rates = cfg["upsample_rates"]
    for i in range(len(rates)):
        w, b = fold(f"ups.{i}")  # ConvTranspose (In, Out, K)
        out[f"ups_{i}"] = {"kernel": w.transpose(2, 0, 1)[::-1].copy(),
                           "bias": b}
        if i + 1 < len(rates):
            w2, b2 = fold(f"noise_convs.{i}")
            out[f"noise_convs_{i}_kernel"] = w2.transpose(2, 1, 0)
            out[f"noise_convs_{i}_bias"] = b2
        else:
            w2, b2 = fold(f"noise_convs.{i}")
            out[f"noise_convs_{i}"] = {"kernel": w2[:, :, 0].T, "bias": b2}
    n_kernels = len(cfg["resblock_kernel_sizes"])
    for i in range(len(rates)):
        for j in range(n_kernels):
            p = f"resblocks.{i * n_kernels + j}"
            blk: dict = {}
            if cfg.get("resblock", "1") == "1":
                for c in range(3):
                    blk[f"convs1_{c}"] = conv(f"{p}.convs1.{c}")
                    blk[f"convs2_{c}"] = conv(f"{p}.convs2.{c}")
            else:
                for c in range(2):
                    blk[f"convs_{c}"] = conv(f"{p}.convs.{c}")
            out[f"resblocks_{i}_{j}"] = blk
    return out
