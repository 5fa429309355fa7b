"""SmoothQuant calibration: migrate activation outliers into weights.

Behavioral reference: tensorrt_llm/quantization/quantize_by_modelopt.py
(int8_sq flow) and the original SmoothQuant recipe — per-input-channel
scales s_j = max|X_j|^α / max|W_j|^(1-α); activations divide by s, the
weight columns multiply by s, so y = (x/s)·(s·W) is exact in fp while
the int8 quantization error moves off the activation outlier channels.

Calibration collects per-channel activation maxima with torch forward
hooks on every nn.Linear (the checkpoint's own pre_quant_scale wins
when a ModelOpt int8_sq checkpoint supplies one).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def calibrate_smooth_scales(torch_model, sample_ids: Sequence[Sequence[int]],
                            alpha: float = 0.5,
                            clip: tuple = (1e-2, 1e4)
                            ) -> Dict[str, np.ndarray]:
    """Run calibration prompts through the HF torch model, collect
    per-input-channel |x| maxima on every Linear, and return
    {param_name(.weight): s[K]} smoothing scales."""
    import torch
    import torch.nn as nn

    act_max: Dict[str, torch.Tensor] = {}
    handles = []

    def make_hook(name):
        def hook(mod, inputs, output):
            x = inputs[0]
            m = x.detach().abs().reshape(-1, x.shape[-1]).max(dim=0).values
            if name in act_max:
                act_max[name] = torch.maximum(act_max[name], m)
            else:
                act_max[name] = m
        return hook

    linear_mods = {}
    for name, mod in torch_model.named_modules():
        if isinstance(mod, nn.Linear):
            handles.append(mod.register_forward_hook(make_hook(name)))
            linear_mods[name] = mod
    try:
        with torch.no_grad():
            for ids in sample_ids:
                torch_model(torch.tensor([list(ids)], dtype=torch.long))
    finally:
        for h in handles:
            h.remove()

    scales: Dict[str, np.ndarray] = {}
    for name, mod in linear_mods.items():
        if name not in act_max:
            continue
        a = act_max[name].float().clamp(min=1e-5)
        w = mod.weight.detach().abs().max(dim=0).values.float() \
            .clamp(min=1e-5)
        s = (a ** alpha) / (w ** (1.0 - alpha))
        s = s.clamp(*clip)
        scales[name + ".weight"] = s.cpu().numpy()
    return scales


def default_calibration_ids(vocab_size: int, n_prompts: int = 4,
                            length: int = 64) -> List[List[int]]:
    """Deterministic pseudo-random calibration prompts when the user
    supplies none — better than no smoothing, worse than real text;
    documented in the quant notes."""
    rng = np.random.default_rng(1234)
    return [rng.integers(1, max(2, vocab_size - 1), length).tolist()
            for _ in range(n_prompts)]
