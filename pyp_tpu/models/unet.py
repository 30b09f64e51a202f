"""Compact 2D U-Net in flax.linen — the shared backbone for the learned
picker (heatmap regression) and the noise2noise denoiser.

Replaces the role of the reference's torch NN models (detect/joint.py:35
sprtrain 2D picker CNN; cryocare UNet) with a jit/pmap-friendly flax module:
static shapes, grouped norm (batch-size independent), bfloat16-safe.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        x = nn.silu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        return nn.silu(x)


class UNet2D(nn.Module):
    """Encoder-decoder with skip connections; out_channels heads."""

    features: Sequence[int] = (16, 32, 64)
    out_channels: int = 1

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        skips = []
        for f in self.features[:-1]:
            x = ConvBlock(f)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.features[-1])(x)
        for f, skip in zip(reversed(self.features[:-1]), reversed(skips)):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2))(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(f)(x)
        return nn.Conv(self.out_channels, (1, 1))(x)
