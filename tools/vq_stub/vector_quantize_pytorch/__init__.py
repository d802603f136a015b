"""Minimal ResidualFSQ stand-in so the REFERENCE model file can be imported
and executed for golden-fixture generation in an environment without the
vector-quantize-pytorch package.

Implements the FSQ math (Mentzer et al., "Finite Scalar Quantization: VQ-VAE
Made Simple") with the lucidrains packaging used by the reference
(`/root/reference/acestep/models/turbo/modeling_acestep_v15_turbo.py:41,1193-1197`):
ResidualFSQ(dim, levels, num_quantizers) owning project_in/project_out linears
around per-quantizer FSQ cores with scales (levels-1)^-i.

The num_quantizers=1 configuration the reference ships (so scale == 1) is the
only path exercised. NOTE: this is a re-derivation, not the upstream package;
the one convention that cannot be cross-checked offline is the tanh bound's
eps sign (quantize-time only). The indices<->codes mapping — the path LM audio
codes travel through `get_output_from_indices` — is pure mixed-radix over
basis = cumprod([1, *levels[:-1]]) and does not depend on it.
"""

from __future__ import annotations

from typing import List

import torch
from torch import nn


class _FSQCore(nn.Module):
    """Projection-free FSQ over `levels` scalar dimensions."""

    def __init__(self, levels: List[int]):
        super().__init__()
        lv = torch.tensor(levels, dtype=torch.float32)
        self.register_buffer("_levels", lv, persistent=False)
        basis = torch.cumprod(torch.tensor([1] + levels[:-1], dtype=torch.float32), dim=0)
        self.register_buffer("_basis", basis, persistent=False)

    def bound(self, z: torch.Tensor, eps: float = 1e-3) -> torch.Tensor:
        half_l = (self._levels - 1) * (1 + eps) / 2
        offset = torch.where(self._levels % 2 == 0, 0.5, 0.0)
        shift = torch.atanh(offset / half_l)
        return torch.tanh(z + shift) * half_l - offset

    def quantize(self, z: torch.Tensor) -> torch.Tensor:
        quantized = torch.round(self.bound(z))
        half_width = self._levels // 2
        return quantized / half_width

    def codes_to_indices(self, codes: torch.Tensor) -> torch.Tensor:
        half_width = self._levels // 2
        scaled = codes * half_width + half_width
        return (scaled * self._basis).sum(dim=-1).round().long()

    def indices_to_codes(self, indices: torch.Tensor) -> torch.Tensor:
        half_width = self._levels // 2
        codes_non_centred = torch.floor(indices.unsqueeze(-1) / self._basis) % self._levels
        return (codes_non_centred - half_width) / half_width

    def forward(self, z: torch.Tensor):
        z = z.float()
        codes = self.quantize(z)
        indices = self.codes_to_indices(codes)
        return codes, indices


class ResidualFSQ(nn.Module):
    def __init__(self, *, dim: int, levels: List[int], num_quantizers: int = 1, **_):
        super().__init__()
        self.num_quantizers = num_quantizers
        codebook_dim = len(levels)
        self.project_in = nn.Linear(dim, codebook_dim)
        self.project_out = nn.Linear(codebook_dim, dim)
        self.layers = nn.ModuleList([_FSQCore(levels) for _ in range(num_quantizers)])
        lv = torch.tensor(levels, dtype=torch.float32)
        scales = torch.stack([(lv - 1) ** -i for i in range(num_quantizers)])
        self.register_buffer("scales", scales, persistent=False)
        self.codebook_size = int(torch.prod(lv).item())

    def forward(self, x: torch.Tensor):
        dtype = x.dtype
        x = self.project_in(x)
        quantized_out = torch.zeros_like(x)
        residual = x
        all_indices = []
        for layer, scale in zip(self.layers, self.scales):
            quantized, indices = layer(residual / scale)
            quantized = quantized * scale
            residual = residual - quantized
            quantized_out = quantized_out + quantized
            all_indices.append(indices)
        out = self.project_out(quantized_out.to(dtype))
        return out, torch.stack(all_indices, dim=-1)

    def get_codes_from_indices(self, indices: torch.Tensor) -> torch.Tensor:
        if indices.shape[-1] != self.num_quantizers:
            indices = indices.unsqueeze(-1)
        codes = []
        for qi, (layer, scale) in enumerate(zip(self.layers, self.scales)):
            codes.append(layer.indices_to_codes(indices[..., qi]) * scale)
        return torch.stack(codes, dim=0)

    def get_output_from_indices(self, indices: torch.Tensor) -> torch.Tensor:
        codes = self.get_codes_from_indices(indices)
        return self.project_out(codes.sum(dim=0).float())
