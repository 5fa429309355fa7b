"""Quantize/dequantize primitives.

Functional analog of the reference quantize op family (reference:
cpp/tensorrt_llm/thop/fp8Quantize.cpp, weightOnlyQuantOp.cpp,
kernels/quantization.cu). Weight quantizers run at load time on host or
device; activation quantizers are jitted and fuse into the preceding op.

Conventions (all weights stored as [in_features, out_features] = [K, N],
the natural layout for ``x @ w`` on the MXU):
  * per-channel: scales[N], symmetric.
  * group-wise (AWQ/GPTQ, group size G): scales[K//G, N]; optional
    zero-points for GPTQ.
  * int4 uses the native ``jnp.int4`` dtype — XLA packs two nibbles per
    byte in HBM, which is what the reference's weight interleaver achieves
    manually (cutlass_kernels/cutlass_preprocessors.cpp).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
INT4_MAX = 7.0
FP8_MAX = 448.0  # e4m3 finite max


# --------------------------------------------------------------------- #
# Weight quantization (load-time)
# --------------------------------------------------------------------- #
def quantize_weight_per_channel(w: jnp.ndarray, bits: int = 8
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel weight quant. w: [K, N] float."""
    qmax = INT8_MAX if bits == 8 else INT4_MAX
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)  # [N]
    scale = jnp.maximum(absmax / qmax, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -qmax - 1, qmax)
    dtype = jnp.int8 if bits == 8 else jnp.int4
    return q.astype(dtype), scale.astype(jnp.float32)


def quantize_weight_groupwise(w: jnp.ndarray, group_size: int = 128,
                              bits: int = 4, asymmetric: bool = False
                              ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         Optional[jnp.ndarray]]:
    """AWQ/GPTQ-style group quant along K. Returns (q[K,N], scales[K//G,N],
    zeros[K//G,N] or None)."""
    K, N = w.shape
    if K % group_size:
        raise ValueError(f"K={K} not divisible by group_size={group_size}")
    g = w.astype(jnp.float32).reshape(K // group_size, group_size, N)
    qmax = INT4_MAX if bits == 4 else INT8_MAX
    if asymmetric:
        lo = jnp.min(g, axis=1, keepdims=True)
        hi = jnp.max(g, axis=1, keepdims=True)
        scale = jnp.maximum((hi - lo) / (2 * qmax + 1), 1e-8)
        zero = jnp.round(-lo / scale) - (qmax + 1)
        q = jnp.clip(jnp.round(g / scale) + zero, -qmax - 1, qmax)
        zeros = zero[:, 0, :]
    else:
        absmax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
        scale = jnp.maximum(absmax / qmax, 1e-8)
        q = jnp.clip(jnp.round(g / scale), -qmax - 1, qmax)
        zeros = None
    # int4 values are stored in int8 range [-8, 7]; the linear method packs
    # two-per-byte (ops/pallas/quant_matmul.pack_int4) for the HBM footprint.
    dtype = jnp.int8
    return (q.reshape(K, N).astype(dtype), scale[:, 0, :].astype(jnp.float32),
            None if zeros is None else zeros.astype(jnp.float32))


def dequantize_weight(q: jnp.ndarray, scales: jnp.ndarray,
                      zeros: Optional[jnp.ndarray] = None,
                      group_size: Optional[int] = None,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of the above quantizers (used by the XLA dequant-matmul path;
    XLA fuses convert*scale into the matmul operand feed)."""
    K, N = q.shape
    qf = q.astype(jnp.float32)
    if scales.ndim == 1:  # per-channel
        out = qf * scales[None, :]
    else:  # group-wise
        G = group_size or K // scales.shape[0]
        qg = qf.reshape(K // G, G, N)
        if zeros is not None:
            qg = qg - zeros[:, None, :]
        out = (qg * scales[:, None, :]).reshape(K, N)
    return out.astype(dtype)


# --------------------------------------------------------------------- #
# FP4 (e2m1) — NVFP4 / MXFP4 (reference: _torch/modules/linear.py:1266
# NVFP4 = groups of 16 with e4m3 scales + a global fp32 scale;
# quantization/mode.py:66-104 FP4 weight/KV flags). TPU has no fp4
# datapath: values are rounded to the exact e2m1 grid and STORED as
# int8 holding 2x the code value (all e2m1 values x2 are integers
# <= 12), dequantized by group scales of half the nominal step — the
# "blockscale-fp4-emulated-on-int8" design. Numerics are bit-exact
# NVFP4/MXFP4; HBM footprint is 8b/weight (the 4-bit-packed Pallas
# decode kernel is the follow-on lever).
# --------------------------------------------------------------------- #
_E2M1_GRID = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)


def fp4_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round to the nearest e2m1 value (ties toward the larger code,
    matching round-half-away on this grid), saturating at +-6."""
    grid = jnp.asarray(_E2M1_GRID, jnp.float32)
    mids = (grid[:-1] + grid[1:]) / 2.0          # 7 decision points
    a = jnp.abs(x.astype(jnp.float32))
    idx = jnp.sum(a[..., None] >= mids, axis=-1)
    mag = grid[idx]
    return jnp.where(x < 0, -mag, mag)


def quantize_weight_fp4(w: jnp.ndarray, group_size: int = 16,
                        scale_fmt: str = "e4m3"
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NVFP4 (group 16, e4m3 group scales x global fp32) or MXFP4
    (group 32, e8m0 power-of-two scales) weight quant along K.

    Returns (q_i8[K, N] holding e2m1*2 integer values,
             half_scales f32[K//G, N] = group_scale/2) so that
    ``dequantize_weight(q, half_scales, group_size=G)`` reproduces the
    exact fp4 value — the same storage contract as the int8 groupwise
    path, so the fused dequant-matmul machinery applies unchanged.
    """
    K, N = w.shape
    if K % group_size:
        raise ValueError(f"K={K} not divisible by fp4 group {group_size}")
    g = w.astype(jnp.float32).reshape(K // group_size, group_size, N)
    amax = jnp.max(jnp.abs(g), axis=1)                       # [K/G, N]
    if scale_fmt == "e8m0":
        # MXFP4: shared power-of-two exponent (quantization/mxfp4.py)
        exp = jnp.where(amax > 0,
                        jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30) / 6.0)),
                        0.0)
        scale = jnp.exp2(exp)
    else:
        # NVFP4: per-group e4m3 scale relative to a global fp32 scale
        gmax = jnp.max(amax)
        scale2 = jnp.maximum(gmax / (6.0 * 448.0), 1e-30)
        s_rel = (amax / 6.0) / scale2
        s_rel = s_rel.astype(jnp.float8_e4m3fn).astype(jnp.float32)
        scale = jnp.maximum(s_rel * scale2, 1e-30)
    codes = fp4_round(g / scale[:, None, :])
    q = (codes * 2.0).astype(jnp.int8).reshape(K, N)
    return q, (scale / 2.0).astype(jnp.float32)


def quantize_weight_fp8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor e4m3 weight quant (reference: fp8Quantize.cpp static path)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)))
    scale = jnp.maximum(absmax / FP8_MAX, 1e-8)
    q = (w.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return q, scale.astype(jnp.float32)


def quantize_weight_fp8_blockwise(w: jnp.ndarray, block: int = 128
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """128x128 block-scaled fp8 (DeepSeek style,
    reference: fp8_blockscale_gemm)."""
    K, N = w.shape
    pk, pn = -K % block, -N % block
    wp = jnp.pad(w.astype(jnp.float32), ((0, pk), (0, pn)))
    Kp, Np = wp.shape
    blocks = wp.reshape(Kp // block, block, Np // block, block)
    absmax = jnp.max(jnp.abs(blocks), axis=(1, 3), keepdims=True)
    scale = jnp.maximum(absmax / FP8_MAX, 1e-8)
    q = (blocks / scale).astype(jnp.float8_e4m3fn)
    q = q.reshape(Kp, Np)[:K, :N]
    return q, scale[:, 0, :, 0].astype(jnp.float32)


# --------------------------------------------------------------------- #
# Activation quantization (jitted, fused by XLA)
# --------------------------------------------------------------------- #
def quantize_activation_per_token_int8(x: jnp.ndarray
                                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token symmetric int8 (SmoothQuant activation side;
    reference: kernels/quantization.cu perTokenQuantization)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / INT8_MAX, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return q.astype(jnp.int8), scale


def quantize_activation_fp8(x: jnp.ndarray, scale: Optional[jnp.ndarray] = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static (given scale) or dynamic per-tensor fp8 activation quant."""
    xf = x.astype(jnp.float32)
    if scale is None:
        absmax = jnp.max(jnp.abs(xf))
        scale = jnp.maximum(absmax / FP8_MAX, 1e-8)
    q = jnp.clip(xf / scale, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)
    return q, scale
