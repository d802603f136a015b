"""Torch mirror of diffusers' AutoencoderOobleck module graph — golden oracle
for the VAE converter + JAX forward.

diffusers is not installed in this environment, so this re-states the Oobleck
architecture (Stable-Audio VAE; reference loads it via diffusers at
`/root/reference/acestep/core/generation/handler/init_service_loader.py:123-144`,
MLX mirror at `/root/reference/acestep/models/mlx/vae_model.py`) with diffusers'
exact state_dict naming, including old-style torch weight_norm
(`weight_g`/`weight_v`) on every conv — the layout real checkpoints ship with,
and the one `vae.convert_torch_vae_state` must fold.

Used only by tools/golden_gen.py; not part of the shipping framework.
"""

from __future__ import annotations

import math
from typing import Sequence

import torch
from torch import nn
from torch.nn.utils import weight_norm


class Snake1d(nn.Module):
    """x + (1/beta)·sin²(alpha·x), alpha/beta stored log-scale, shape (1,C,1)."""

    def __init__(self, dim: int):
        super().__init__()
        self.alpha = nn.Parameter(torch.zeros(1, dim, 1))
        self.beta = nn.Parameter(torch.zeros(1, dim, 1))

    def forward(self, x):
        alpha = torch.exp(self.alpha)
        beta = torch.exp(self.beta)
        return x + (1.0 / (beta + 1e-9)) * torch.sin(alpha * x) ** 2


class OobleckResidualUnit(nn.Module):
    def __init__(self, dim: int, dilation: int):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.snake1 = Snake1d(dim)
        self.conv1 = weight_norm(nn.Conv1d(dim, dim, 7, dilation=dilation, padding=pad))
        self.snake2 = Snake1d(dim)
        self.conv2 = weight_norm(nn.Conv1d(dim, dim, 1))

    def forward(self, x):
        h = self.conv1(self.snake1(x))
        h = self.conv2(self.snake2(h))
        return x + h


class OobleckEncoderBlock(nn.Module):
    def __init__(self, c_in: int, c_out: int, stride: int):
        super().__init__()
        self.res_unit1 = OobleckResidualUnit(c_in, 1)
        self.res_unit2 = OobleckResidualUnit(c_in, 3)
        self.res_unit3 = OobleckResidualUnit(c_in, 9)
        self.snake1 = Snake1d(c_in)
        self.conv1 = weight_norm(
            nn.Conv1d(c_in, c_out, 2 * stride, stride=stride, padding=math.ceil(stride / 2))
        )

    def forward(self, x):
        x = self.res_unit3(self.res_unit2(self.res_unit1(x)))
        return self.conv1(self.snake1(x))


class OobleckDecoderBlock(nn.Module):
    def __init__(self, c_in: int, c_out: int, stride: int):
        super().__init__()
        self.snake1 = Snake1d(c_in)
        self.conv_t1 = weight_norm(
            nn.ConvTranspose1d(c_in, c_out, 2 * stride, stride=stride, padding=math.ceil(stride / 2))
        )
        self.res_unit1 = OobleckResidualUnit(c_out, 1)
        self.res_unit2 = OobleckResidualUnit(c_out, 3)
        self.res_unit3 = OobleckResidualUnit(c_out, 9)

    def forward(self, x):
        x = self.conv_t1(self.snake1(x))
        return self.res_unit3(self.res_unit2(self.res_unit1(x)))


class OobleckEncoder(nn.Module):
    def __init__(self, ehs: int, audio_channels: int, ratios: Sequence[int], mults: Sequence[int]):
        super().__init__()
        cm = [1] + list(mults)
        self.conv1 = weight_norm(nn.Conv1d(audio_channels, ehs, 7, padding=3))
        self.block = nn.ModuleList(
            [OobleckEncoderBlock(ehs * cm[i], ehs * cm[i + 1], s) for i, s in enumerate(ratios)]
        )
        self.snake1 = Snake1d(ehs * cm[-1])
        self.conv2 = weight_norm(nn.Conv1d(ehs * cm[-1], ehs, 3, padding=1))

    def forward(self, x):
        x = self.conv1(x)
        for b in self.block:
            x = b(x)
        return self.conv2(self.snake1(x))


class OobleckDecoder(nn.Module):
    def __init__(self, ch: int, latent_dim: int, audio_channels: int,
                 ratios: Sequence[int], mults: Sequence[int]):
        super().__init__()
        cm = [1] + list(mults)
        ups = list(reversed(ratios))
        n = len(ups)
        self.conv1 = weight_norm(nn.Conv1d(latent_dim, ch * cm[-1], 7, padding=3))
        self.block = nn.ModuleList(
            [OobleckDecoderBlock(ch * cm[n - i], ch * cm[n - i - 1], s) for i, s in enumerate(ups)]
        )
        self.snake1 = Snake1d(ch)
        self.conv2 = weight_norm(nn.Conv1d(ch, audio_channels, 7, padding=3, bias=False))

    def forward(self, x):
        x = self.conv1(x)
        for b in self.block:
            x = b(x)
        return self.conv2(self.snake1(x))


class AutoencoderOobleckMirror(nn.Module):
    def __init__(self, *, encoder_hidden_size: int, downsampling_ratios: Sequence[int],
                 channel_multiples: Sequence[int], decoder_channels: int,
                 decoder_input_channels: int, audio_channels: int):
        super().__init__()
        self.encoder = OobleckEncoder(
            encoder_hidden_size, audio_channels, downsampling_ratios, channel_multiples
        )
        self.decoder = OobleckDecoder(
            decoder_channels, decoder_input_channels, audio_channels,
            downsampling_ratios, channel_multiples,
        )

    def encode_raw(self, audio):  # (B, C, L) -> (B, 2*latent, L/hop)
        return self.encoder(audio)

    def decode(self, latents):  # (B, latent, T) -> (B, C, L)
        return self.decoder(latents)
