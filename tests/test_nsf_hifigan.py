"""NSF-HiFiGAN tests: phase math, generator output geometry, GAN losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ns2vc_tpu.models.nsf_hifigan import (
    MultiPeriodDiscriminator, MultiScaleDiscriminator, NSFHiFiGANGenerator,
    _mod1_cumsum, discriminator_loss, feature_loss, generator_loss,
    sine_source,
)


class TestSineSource:
    def test_mod1_cumsum_matches_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (2, 5000, 3)).astype(np.float32)
        got = np.asarray(_mod1_cumsum(jnp.asarray(x), block=256))
        want = np.mod(np.cumsum(x.astype(np.float64), axis=1), 1.0)
        # compare on the circle (wrap-around distance)
        d = np.abs(got - want)
        d = np.minimum(d, 1 - d)
        assert d.max() < 1e-3, d.max()

    def test_fundamental_frequency(self):
        sr, upp, f0_hz, frames = 16000, 320, 200.0, 50
        f0 = jnp.full((1, frames), f0_hz)
        s = np.asarray(sine_source(f0, upp, sr, harmonic_num=2,
                                   rng=jax.random.PRNGKey(0)))
        assert s.shape == (1, frames * upp, 3)
        spec = np.abs(np.fft.rfft(s[0, :, 0]))
        peak_hz = spec.argmax() * sr / s.shape[1]
        assert abs(peak_hz - f0_hz) < 2.0, peak_hz
        # second harmonic channel peaks at 2*f0
        spec2 = np.abs(np.fft.rfft(s[0, :, 1]))
        peak2 = spec2.argmax() * sr / s.shape[1]
        assert abs(peak2 - 2 * f0_hz) < 2.0, peak2

    def test_unvoiced_is_dc(self):
        s = np.asarray(sine_source(jnp.zeros((1, 10)), 100, 16000, 0,
                                   jax.random.PRNGKey(0)))
        # zero F0 -> constant phase -> constant output
        assert np.abs(np.diff(s[0, :, 0])).max() < 1e-5


class TestGenerator:
    @pytest.mark.slow
    def test_output_length_and_finite(self):
        gen = NSFHiFiGANGenerator(
            num_mels=16, upsample_initial_channel=32,
            upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            sampling_rate=16000)
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 16))
        f0 = jnp.full((2, 20), 220.0)
        params = gen.init(jax.random.PRNGKey(1), mel, f0)
        wav = np.asarray(gen.apply(params, mel, f0))
        assert wav.shape == (2, 20 * 32)
        assert np.isfinite(wav).all()
        assert np.abs(wav).max() <= 1.0  # tanh output


class TestDiscriminators:
    @pytest.mark.slow
    def test_losses(self):
        y = jax.random.normal(jax.random.PRNGKey(0), (2, 640))
        y_hat = jax.random.normal(jax.random.PRNGKey(1), (2, 640))
        mpd = MultiPeriodDiscriminator(periods=(2, 3))
        pp = mpd.init(jax.random.PRNGKey(2), y, y_hat)
        outs_r, outs_g, fr, fg = mpd.apply(pp, y, y_hat)
        assert len(outs_r) == 2
        d = float(discriminator_loss(outs_r, outs_g))
        g = float(generator_loss(outs_g))
        f = float(feature_loss(fr, fg))
        assert np.isfinite([d, g, f]).all()
        # identical inputs -> zero feature loss
        outs_r2, outs_g2, fr2, fg2 = mpd.apply(pp, y, y)
        assert float(feature_loss(fr2, fg2)) < 1e-6

    @pytest.mark.slow
    def test_msd(self):
        y = jax.random.normal(jax.random.PRNGKey(0), (1, 1024))
        msd = MultiScaleDiscriminator(num_scales=2)
        ps = msd.init(jax.random.PRNGKey(1), y, y)
        outs_r, outs_g, _, _ = msd.apply(ps, y, y)
        assert len(outs_r) == 2
