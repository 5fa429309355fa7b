"""Normalization ops.

Analog of the reference rms_norm/layer_norm modules and their quant-fused
CUDA kernels (reference: tensorrt_llm/_torch/modules/rms_norm.py,
cpp/tensorrt_llm/kernels/fusedLayernormKernels/). On TPU, XLA fuses the
norm into neighboring elementwise chains; the fused residual-add variants
below reproduce the reference's AllReduce+residual+RMSNorm epilogue pattern
(distributed/ops.py:646) as plain composable functions — GSPMD handles the
collective, XLA the fusion.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6,
             bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    out = out.astype(dtype) * weight
    if bias is not None:
        out = out + bias
    return out


def rms_norm_residual(x: jnp.ndarray, residual: jnp.ndarray,
                      weight: jnp.ndarray, eps: float = 1e-6
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused residual-add + RMSNorm: returns (normed, new_residual)."""
    resid = x + residual
    return rms_norm(resid, weight, eps), resid


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray,
               bias: Optional[jnp.ndarray] = None,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps)
    out = out.astype(dtype) * weight
    if bias is not None:
        out = out + bias
    return out


def layer_norm_residual(x: jnp.ndarray, residual: jnp.ndarray,
                        weight: jnp.ndarray, bias: Optional[jnp.ndarray],
                        eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    resid = x + residual
    return layer_norm(resid, weight, bias, eps), resid
