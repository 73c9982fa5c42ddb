"""GroupNorm with a layout-friendly stats pass (perf experiment).

The UNet's GroupNorm(8) sites (reference unet1d/resnet.py:461-640,
unet_1d_condition.py conv_norm_out) dominate the train step's norm-stat
reduce fusions (18.1 ms/call synth, CLAUDE.md device profile), running
3-6x off HBM bandwidth. Hypothesis: flax's nn.GroupNorm reshapes
(B, T, C) -> (B, T, G, C/G) and reduces over (T, C/G); with C/G = 32 the
minor dimension drops below the TPU's 128-lane tile, so the stats read is
a layout-transposing one. This variant keeps the (B, T, C) layout: a
per-channel sum/sumsq reduce over T (sublane reduction, lanes intact),
then the group combine happens on the tiny (B, C) partials, and the
normalizer broadcasts back with a lane-preserving gather-free repeat.

Mathematically identical to nn.GroupNorm (sum over T then channels ==
sum over the group block); stats in f32 like flax's _compute_stats.

Dispatch: `NS2VC_GN_IMPL=chanstats` opts in; default is flax (measured
baseline). Param tree is identical to nn.GroupNorm ({scale, bias}), so
checkpoints and the reference weight converter are unaffected.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn


def group_norm_chanstats(x: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, groups: int,
                         eps: float) -> jnp.ndarray:
    """GroupNorm over (B, T, C) with per-channel-first statistics."""
    B, T, C = x.shape
    cpg = C // groups
    xf = x.astype(jnp.float32)
    # stage 1: (B, T, C) -> (B, C), lanes (C) intact, reduce over sublanes
    s = jnp.sum(xf, axis=1)
    s2 = jnp.sum(xf * xf, axis=1)
    # stage 2: group combine on the tiny (B, C) partials
    n = T * cpg
    gsum = s.reshape(B, groups, cpg).sum(-1)
    gsum2 = s2.reshape(B, groups, cpg).sum(-1)
    mean = gsum / n
    var = gsum2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cpg, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd, cpg, axis=-1)
    out_dtype = jnp.promote_types(x.dtype, jnp.promote_types(scale.dtype,
                                                             bias.dtype))
    y = (xf - mean_c[:, None, :]) * rstd_c[:, None, :]
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class ChanStatsGroupNorm(nn.Module):
    """nn.GroupNorm-shaped module ({scale, bias}, same shapes/inits)
    running the chanstats kernel above."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_chanstats(x, scale, bias, self.num_groups,
                                    self.epsilon)


def make_group_norm(num_groups: int, epsilon: float = 1e-5,
                    name: str | None = None) -> nn.Module:
    """GroupNorm factory for call sites: flax (default) or the chanstats
    variant when NS2VC_GN_IMPL=chanstats. Both declare the identical
    {scale, bias} param tree under `name`."""
    if os.environ.get("NS2VC_GN_IMPL") == "chanstats":
        return ChanStatsGroupNorm(num_groups=num_groups, epsilon=epsilon,
                                  name=name)
    return nn.GroupNorm(num_groups=num_groups, epsilon=epsilon, name=name)
