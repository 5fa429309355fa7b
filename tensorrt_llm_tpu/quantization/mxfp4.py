"""MXFP4 (microscaling fp4) checkpoint ingestion.

Behavioral reference: the reference's W4A8_MXFP4 linear methods
(reference: _torch/modules/linear.py:2053) and the GPT-OSS HF loader
(modeling_gpt_oss.py:703 — ``*_blocks`` uint8 fp4-pair tensors +
``*_scales`` e8m0 block exponents, 32 elements per block, gate/up rows
interleaved).

TPU has no fp4 datapath, so ingestion DEQUANTIZES: e2m1 nibbles decode
through a 16-entry LUT and multiply by the shared power-of-two block
scale. The result feeds the normal weight pipeline — bf16, or
re-quantized to the groupwise-int4 fused dequant matmul (W4A16) which
preserves the 4-bit memory footprint on HBM.

Layouts (OpenAI GPT-OSS checkpoints):
  blocks  u8[..., n_blocks, 16]   two fp4 values per byte, low nibble
                                  first (element order within block)
  scales  u8[..., n_blocks]       e8m0 exponent, value = 2^(s - 127)
"""
from __future__ import annotations

import numpy as np

# e2m1 magnitude table: [sign(1) | exp(2) | mantissa(1)]
_E2M1 = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
_LUT = np.concatenate([_E2M1, -_E2M1])     # index by full 4-bit code


def dequant_mxfp4(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """u8 blocks [..., B, 16] + e8m0 scales [..., B] -> f32 [..., B*32]."""
    blocks = np.asarray(blocks, np.uint8)
    scales = np.asarray(scales, np.uint8)
    lo = _LUT[blocks & 0xF]                      # [..., B, 16]
    hi = _LUT[blocks >> 4]
    vals = np.stack([lo, hi], axis=-1).reshape(*blocks.shape[:-1], 32)
    scale = np.exp2(scales.astype(np.int32) - 127).astype(np.float32)
    out = vals * scale[..., None]
    return out.reshape(*blocks.shape[:-2], blocks.shape[-2] * 32)


def quantize_mxfp4(w: np.ndarray) -> tuple:
    """f32 [..., K] -> (blocks u8[..., K/32, 16], scales u8[..., K/32]).
    Shared e8m0 scale = 2^ceil(log2(absmax/6)); round-to-nearest e2m1.
    (Used by tests and by offline conversion tooling.)"""
    K = w.shape[-1]
    assert K % 32 == 0, "MXFP4 needs the reduction dim % 32 == 0"
    v = np.asarray(w, np.float32).reshape(*w.shape[:-1], K // 32, 32)
    amax = np.abs(v).max(axis=-1)
    exp = np.where(amax > 0,
                   np.ceil(np.log2(np.maximum(amax, 1e-30) / 6.0)),
                   0.0).astype(np.int32)
    exp = np.clip(exp + 127, 0, 255).astype(np.uint8)
    scale = np.exp2(exp.astype(np.int32) - 127).astype(np.float32)
    scaled = v / scale[..., None]
    # nearest e2m1 MAGNITUDE code, sign in bit 3
    idx = np.abs(np.abs(scaled)[..., None] - _E2M1).argmin(
        axis=-1).astype(np.uint8)
    idx = np.where(scaled < 0, idx + 8, idx).astype(np.uint8)
    lo = idx[..., 0::2]
    hi = idx[..., 1::2]
    blocks = (lo | (hi << 4)).astype(np.uint8)
    return blocks, exp


def normalize_mxfp4_state_dict(sd: dict) -> dict:
    """Replace every ``<name>_blocks``/``<name>_scales`` pair with the
    dequantized ``<name>`` tensor (keeping the checkpoint's row-major
    [out, in] orientation; callers transpose as usual). Non-MXFP4
    tensors pass through untouched."""
    out = dict(sd)
    for key in list(sd):
        if not key.endswith("_blocks"):
            continue
        base = key[: -len("_blocks")]
        skey = base + "_scales"
        if skey not in sd:
            continue
        deq = dequant_mxfp4(np.asarray(sd[key]), np.asarray(sd[skey]))
        out[base] = deq
        del out[key]
        del out[skey]
    return out
