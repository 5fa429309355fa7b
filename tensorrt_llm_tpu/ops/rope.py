"""Rotary position embeddings.

Functional analog of the reference RoPE stack (reference:
tensorrt_llm/_torch/modules/rotary_embedding.py and the fused-in-op RoPE of
thop/attentionOp.cpp). On TPU, RoPE is a cheap elementwise op that XLA
fuses into the surrounding QKV projection, so there is no separate kernel:
we precompute the inv-freq table once and apply cos/sin at the gathered
positions inside the jitted forward.

Supports the scaling families the reference models use: none, linear,
llama3 (low/high-freq wavelength bands), yarn, and gpt-neox vs gpt-j
(interleaved) rotation styles.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    head_dim: int
    rope_theta: float = 10000.0
    max_position_embeddings: int = 8192
    scaling_type: str = "none"       # none|linear|llama3|yarn|dynamic
    scaling_factor: float = 1.0
    # llama3
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192
    # yarn
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0
    mscale_all_dim: float = 0.0
    # style
    is_neox: bool = True             # True: rotate halves; False: interleaved (gpt-j)
    partial_rotary_factor: float = 1.0

    @classmethod
    def from_hf_config(cls, cfg, head_dim: Optional[int] = None) -> "RopeConfig":
        head_dim = head_dim or getattr(cfg, "head_dim", None) or \
            cfg.hidden_size // cfg.num_attention_heads
        rs = getattr(cfg, "rope_scaling", None) or {}
        stype = rs.get("rope_type", rs.get("type", "none")) if rs else "none"
        if stype == "default":
            stype = "none"
        return cls(
            head_dim=head_dim,
            rope_theta=getattr(cfg, "rope_theta", 10000.0),
            max_position_embeddings=getattr(cfg, "max_position_embeddings", 8192),
            scaling_type=stype,
            scaling_factor=rs.get("factor", 1.0),
            low_freq_factor=rs.get("low_freq_factor", 1.0),
            high_freq_factor=rs.get("high_freq_factor", 4.0),
            original_max_position_embeddings=rs.get(
                "original_max_position_embeddings",
                getattr(cfg, "max_position_embeddings", 8192)),
            beta_fast=rs.get("beta_fast", 32.0),
            beta_slow=rs.get("beta_slow", 1.0),
            mscale=rs.get("mscale", 1.0),
            mscale_all_dim=rs.get("mscale_all_dim", 0.0),
            partial_rotary_factor=getattr(cfg, "partial_rotary_factor", 1.0),
        )


def compute_inv_freq(cfg: RopeConfig) -> jnp.ndarray:
    """Per-dimension inverse frequencies with scaling applied."""
    rotary_dim = int(cfg.head_dim * cfg.partial_rotary_factor)
    exponent = jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim
    inv_freq = 1.0 / (cfg.rope_theta ** exponent)
    if cfg.scaling_type == "linear":
        inv_freq = inv_freq / cfg.scaling_factor
    elif cfg.scaling_type == "llama3":
        # band-split smoothing (HF modeling_rope_utils llama3 rule)
        low_wl = cfg.original_max_position_embeddings / cfg.low_freq_factor
        high_wl = cfg.original_max_position_embeddings / cfg.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        smooth = (cfg.original_max_position_embeddings / wavelen - cfg.low_freq_factor) \
            / (cfg.high_freq_factor - cfg.low_freq_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = inv_freq / cfg.scaling_factor
        smoothed = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(wavelen > low_wl, scaled,
                             jnp.where(wavelen < high_wl, inv_freq, smoothed))
    elif cfg.scaling_type == "yarn":
        # NTK-by-parts interpolation (yarn paper / HF implementation)
        rot = rotary_dim

        def find_dim(num_rot):
            return (rot * math.log(cfg.original_max_position_embeddings /
                                   (num_rot * 2 * math.pi))) / \
                (2 * math.log(cfg.rope_theta))
        low = max(math.floor(find_dim(cfg.beta_fast)), 0)
        high = min(math.ceil(find_dim(cfg.beta_slow)), rot // 2 - 1)
        ramp = (jnp.arange(rot // 2, dtype=jnp.float32) - low) / max(high - low, 1)
        mask = 1.0 - jnp.clip(ramp, 0.0, 1.0)
        inv_freq = inv_freq / cfg.scaling_factor * (1 - mask) + inv_freq * mask
    return inv_freq


def rope_cos_sin(cfg: RopeConfig, positions: jnp.ndarray
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables at the given positions: returns ([T, rot/2], [T, rot/2])."""
    inv_freq = compute_inv_freq(cfg)
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    attn_scale = 1.0
    if cfg.scaling_type == "yarn" and cfg.mscale:
        def yarn_mscale(scale, m):
            return 1.0 if scale <= 1 or m == 0 else 0.1 * m * math.log(scale) + 1.0
        attn_scale = yarn_mscale(cfg.scaling_factor, cfg.mscale) / \
            yarn_mscale(cfg.scaling_factor, cfg.mscale_all_dim)
    return jnp.cos(angles) * attn_scale, jnp.sin(angles) * attn_scale


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               is_neox: bool = True) -> jnp.ndarray:
    """Apply RoPE to ``x`` of shape [T, heads, head_dim].

    ``cos``/``sin`` are [T, rot/2]. neox style rotates (first, second)
    halves; gpt-j style rotates (even, odd) interleaved pairs.
    """
    orig_dtype = x.dtype
    rot = cos.shape[-1] * 2
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    xf = x_rot.astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    if is_neox:
        x1, x2 = xf[..., :rot // 2], xf[..., rot // 2:]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.concatenate([o1, o2], axis=-1)
    else:
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
    out = out.astype(orig_dtype)
    if x_pass.shape[-1]:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def mrope_cos_sin(cfg: RopeConfig, positions3: jnp.ndarray,
                  sections: tuple) -> tuple[jnp.ndarray, jnp.ndarray]:
    """M-RoPE (Qwen2-VL) tables: ``positions3`` i32[3, T] carries
    temporal/height/width positions; frequency dims are split into
    ``sections`` (summing to rot/2) and section j takes its angles from
    axis j (reference: apply_multimodal_rotary_pos_emb — the half-size
    layout here folds HF's doubled-section split)."""
    inv_freq = compute_inv_freq(cfg)
    angles3 = positions3.astype(jnp.float32)[:, :, None] * \
        inv_freq[None, None, :]                       # [3, T, rot/2]
    parts, off = [], 0
    for j, s in enumerate(sections):
        parts.append(angles3[j % 3, :, off:off + s])
        off += s
    angles = jnp.concatenate(parts, axis=-1)
    return jnp.cos(angles), jnp.sin(angles)
