"""Linear layer methods: the quantization-algorithm dispatch.

TPU-native analog of the reference ``Linear`` + ``LinearMethodBase``
per-algorithm stack (reference: tensorrt_llm/_torch/modules/linear.py:331 —
Unquantized:465, FP8 QDQ:600, FP8 block-scales:1063, weight-only
INT4/INT8:2165, W4A16 AWQ:2287, SmoothQuant via quantization/ layers).

Each method owns: (a) ``quantize_weights`` — load-time conversion of a
bf16 weight to its stored form, and (b) ``apply`` — the jitted matmul
path. Stored form always keeps weights as [K, N] so ``x @ w`` feeds the
MXU without transposes. The XLA dequant path relies on XLA fusing
convert+scale into the matmul operand read; the groupwise path can also
route through the fused Pallas dequant-matmul kernel
(ops/pallas/quant_matmul.py) which reads int4/int8 weights straight from
HBM at the quantized footprint (the weightOnlyBatchedGemv role,
reference: kernels/weightOnlyBatchedGemv/kernel.h:31).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..quantization.mode import QuantAlgo
from . import quant as Q


class LinearMethod:
    """Base: unquantized bf16 matmul."""
    name = "unquantized"

    def __init__(self, quant_config=None):
        self.quant_config = quant_config

    def quantize_weights(self, w: jnp.ndarray, dtype=jnp.bfloat16
                         ) -> Dict[str, jnp.ndarray]:
        return {"weight": w.astype(dtype)}

    def apply(self, params: Dict[str, jnp.ndarray], x: jnp.ndarray
              ) -> jnp.ndarray:
        out = jnp.dot(x, params["weight"],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"]
        return out


class WeightOnlyPerChannelMethod(LinearMethod):
    """W8A16 / W4A16 per-channel (linear.py:2165)."""

    def __init__(self, quant_config, bits: int):
        super().__init__(quant_config)
        self.bits = bits
        self.name = f"w{bits}a16"

    def quantize_weights(self, w, dtype=jnp.bfloat16):
        q, s = Q.quantize_weight_per_channel(w, bits=self.bits)
        return {"weight": q, "weight_scale": s}

    def apply(self, params, x):
        w = Q.dequantize_weight(params["weight"], params["weight_scale"],
                                dtype=x.dtype)
        out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"]
        return out


class WeightOnlyGroupwiseMethod(LinearMethod):
    """W4A16_AWQ / W4A16_GPTQ group-scaled (linear.py:2287,2431)."""

    def __init__(self, quant_config, bits: int = 4, asymmetric: bool = False,
                 use_pallas: Optional[bool] = None):
        super().__init__(quant_config)
        self.bits = bits
        self.asymmetric = asymmetric
        self.group_size = quant_config.group_size if quant_config else 128
        self.name = f"w{bits}a16_group"
        self.use_pallas = use_pallas

    def quantize_weights(self, w, dtype=jnp.bfloat16):
        q, s, z = Q.quantize_weight_groupwise(
            w, group_size=self.group_size, bits=self.bits,
            asymmetric=self.asymmetric)
        if self.bits == 4 and z is None:
            from .pallas.quant_matmul import pack_int4
            q = pack_int4(q)
        out = {"weight": q, "weight_scale": s}
        if z is not None:
            out["weight_zero"] = z
        return out

    def apply(self, params, x):
        import os
        interpret = os.environ.get("TLLM_TPU_PALLAS_INTERPRET") == "1"
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = ((jax.default_backend() == "tpu" or interpret) and
                          os.environ.get("TLLM_TPU_DISABLE_PALLAS_QUANT")
                          != "1")
        packed = self.bits == 4 and "weight_zero" not in params
        x2d = x.reshape(-1, x.shape[-1])
        if use_pallas and packed:
            from .pallas.quant_matmul import groupwise_dequant_matmul_sharded
            out = groupwise_dequant_matmul_sharded(
                x2d, params["weight"], params["weight_scale"],
                group_size=self.group_size, bits=4, interpret=interpret)
        elif use_pallas and self.bits == 8 and "weight_zero" not in params:
            from .pallas.quant_matmul import groupwise_dequant_matmul_sharded
            out = groupwise_dequant_matmul_sharded(
                x2d, params["weight"], params["weight_scale"],
                group_size=self.group_size, bits=8, interpret=interpret)
        else:
            wq = params["weight"]
            if packed:
                from .pallas.quant_matmul import unpack_int4
                wq = unpack_int4(wq)
            w = Q.dequantize_weight(
                wq, params["weight_scale"],
                zeros=params.get("weight_zero"),
                group_size=self.group_size, dtype=x.dtype)
            out = jnp.dot(x2d, w, preferred_element_type=jnp.float32
                          ).astype(x.dtype)
        out = out.reshape(*x.shape[:-1], out.shape[-1])
        if "bias" in params:
            out = out + params["bias"]
        return out


class Fp4GroupwiseMethod(LinearMethod):
    """NVFP4 / MXFP4 generic linear (reference: linear.py:1266 NVFP4,
    :2053 W4A8_MXFP4).

    TPU has no fp4 datapath: weights round to the exact e2m1 grid at
    load (ops/quant.quantize_weight_fp4) and are stored as int8 code
    values with half-step group scales — numerics bit-match the
    reference's dequantized fp4, while the matmul runs the same fused
    int8 group-dequant path as W8A16. NVFP4 = groups of 16, e4m3 group
    scales under a global fp32 scale; MXFP4 = groups of 32, e8m0.
    """

    def __init__(self, quant_config, flavor: str = "nvfp4"):
        super().__init__(quant_config)
        self.flavor = flavor
        self.group_size = 16 if flavor == "nvfp4" else 32
        self.name = flavor

    def quantize_weights(self, w, dtype=jnp.bfloat16):
        q, s_half = Q.quantize_weight_fp4(
            w, group_size=self.group_size,
            scale_fmt="e4m3" if self.flavor == "nvfp4" else "e8m0")
        return {"weight": q, "weight_scale": s_half}

    def apply(self, params, x):
        import os
        interpret = os.environ.get("TLLM_TPU_PALLAS_INTERPRET") == "1"
        x2d = x.reshape(-1, x.shape[-1])
        # the Pallas int8 group kernel tiles weights (group, 128);
        # group 16 is below the int8 sublane tile — route g=32 (MXFP4)
        # through the fused kernel, g=16 (NVFP4) through the XLA
        # dequant path (XLA fuses convert*scale into the matmul feed)
        use_pallas = ((jax.default_backend() == "tpu" or interpret)
                      and self.group_size >= 32
                      and os.environ.get("TLLM_TPU_DISABLE_PALLAS_QUANT")
                      != "1")
        if use_pallas:
            from .pallas.quant_matmul import groupwise_dequant_matmul_sharded
            out = groupwise_dequant_matmul_sharded(
                x2d, params["weight"], params["weight_scale"],
                group_size=self.group_size, bits=8, interpret=interpret)
        else:
            w = Q.dequantize_weight(params["weight"],
                                    params["weight_scale"],
                                    group_size=self.group_size,
                                    dtype=x.dtype)
            out = jnp.dot(x2d, w, preferred_element_type=jnp.float32
                          ).astype(x.dtype)
        out = out.reshape(*x.shape[:-1], out.shape[-1])
        if "bias" in params:
            out = out + params["bias"]
        return out


class SmoothQuantMethod(LinearMethod):
    """W8A8 per-channel weight / per-token activation int8 GEMM
    (reference: cutlass_kernels/int8_gemm + per-token dequant epilogue).
    int8×int8→int32 hits the MXU at double rate on TPU."""
    name = "w8a8_sq"

    def quantize_weights(self, w, dtype=jnp.bfloat16):
        q, s = Q.quantize_weight_per_channel(w, bits=8)
        return {"weight": q, "weight_scale": s}

    def apply(self, params, x):
        if "smooth" in params:
            x = (x.astype(jnp.float32)
                 / params["smooth"]).astype(x.dtype)
        xq, x_scale = Q.quantize_activation_per_token_int8(x)
        acc = jax.lax.dot_general(
            xq, params["weight"], (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * x_scale * params["weight_scale"]
        out = out.astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"]
        return out


class Fp8QdqMethod(LinearMethod):
    """FP8 e4m3 per-tensor weights + dynamic per-tensor activations
    (linear.py:600). The weight stays fp8 in HBM (half the traffic); the
    dot itself feeds XLA a NATIVE fp8xbf16 dot_general — probed working
    on the attached TPU (chips without an fp8 MXU path upcast inside
    XLA, numerically identical). TLLM_TPU_FP8_UPCAST=1 forces the
    explicit bf16 upcast for comparison."""
    name = "fp8"

    def quantize_weights(self, w, dtype=jnp.bfloat16):
        q, s = Q.quantize_weight_fp8(w)
        return {"weight": q, "weight_scale": s}

    def apply(self, params, x):
        import os
        if os.environ.get("TLLM_TPU_FP8_UPCAST") == "1":
            w = params["weight"].astype(jnp.bfloat16)
            out = jnp.dot(x.astype(jnp.bfloat16), w,
                          preferred_element_type=jnp.float32)
        else:
            out = jax.lax.dot_general(
                x.astype(jnp.bfloat16), params["weight"],
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out = (out * params["weight_scale"]).astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"]
        return out


class Fp8BlockwiseMethod(LinearMethod):
    """128x128 block-scaled fp8 (DeepSeek recipe, linear.py:1063)."""
    name = "fp8_block"

    def __init__(self, quant_config=None, block: int = 128):
        super().__init__(quant_config)
        self.block = block

    def quantize_weights(self, w, dtype=jnp.bfloat16):
        q, s = Q.quantize_weight_fp8_blockwise(w, block=self.block)
        return {"weight": q, "weight_scale": s}

    def apply(self, params, x):
        q = params["weight"]
        s = params["weight_scale"]
        K, N = q.shape
        B = self.block
        w = q.astype(jnp.float32)
        pk, pn = -K % B, -N % B
        if pk or pn:
            w = jnp.pad(w, ((0, pk), (0, pn)))
        w = (w.reshape((K + pk) // B, B, (N + pn) // B, B)
             * s[:, None, :, None]).reshape(K + pk, N + pn)[:K, :N]
        out = jnp.dot(x, w.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"]
        return out


class W4A8QServeMethod(LinearMethod):
    """W4A8 (QServe / W4A8_AWQ role, reference: qserve int4xint8 GEMM,
    w4a8_awq mode.py entry): weights quantize to int4 with GROUP scales
    expressed on the int8 grid, activations to per-token int8; the MXU
    runs an int8xint8->int32 dot on the unpacked weights, and the
    epilogue applies (act_scale x group_scale x channel_scale). TPU has
    no native int4 lanes, so int4 storage halves HBM traffic and the
    unpack rides the dot's operand preparation."""
    name = "w4a8"

    def __init__(self, quant_config=None):
        super().__init__(quant_config)
        self.group_size = quant_config.group_size if quant_config else 128

    def quantize_weights(self, w, dtype=jnp.bfloat16):
        G = self.group_size
        K, N = w.shape
        Gk = max(1, K // max(1, G))
        wg = w.reshape(Gk, -1, N).astype(jnp.float32)
        # two-level scaling (QServe): per-channel int8-range scale, then
        # per-group int4 scale on the int8 grid
        ch_scale = jnp.max(jnp.abs(wg), axis=(0, 1)) / 127.0 + 1e-12
        w8 = wg / ch_scale                       # on the int8 grid
        g_scale = jnp.max(jnp.abs(w8), axis=1, keepdims=True) / 7.0 + 1e-12
        q = jnp.clip(jnp.round(w8 / g_scale), -8, 7).astype(jnp.int8)
        return {"weight": q.reshape(K, N),
                "weight_scale": g_scale[:, 0, :].astype(jnp.float32),
                "channel_scale": ch_scale.astype(jnp.float32)}

    def apply(self, params, x):
        if "smooth" in params:
            x = (x.astype(jnp.float32) / params["smooth"]).astype(x.dtype)
        xq, x_scale = Q.quantize_activation_per_token_int8(x)
        K, N = params["weight"].shape
        Gk = params["weight_scale"].shape[0]
        # int4-grid weights -> int8 grid per group, then one int8 dot
        w8 = (params["weight"].reshape(Gk, -1, N).astype(jnp.float32)
              * params["weight_scale"][:, None, :])
        w8 = jnp.clip(jnp.round(w8), -127, 127).astype(jnp.int8) \
            .reshape(K, N)
        acc = jax.lax.dot_general(
            xq, w8, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * x_scale * params["channel_scale"]
        out = out.astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"]
        return out


def make_linear_method(quant_config, layer_name: str = "") -> LinearMethod:
    """Factory mirroring the reference per-layer method selection
    (linear.py get_quant_method), honoring ``exclude_modules``."""
    if quant_config is None or quant_config.quant_algo == QuantAlgo.NO_QUANT:
        return LinearMethod(quant_config)
    for pattern in quant_config.exclude_modules:
        if pattern and pattern in layer_name:
            return LinearMethod(quant_config)
    algo = quant_config.quant_algo
    if algo == QuantAlgo.W8A16:
        return WeightOnlyPerChannelMethod(quant_config, bits=8)
    if algo == QuantAlgo.W4A16:
        return WeightOnlyPerChannelMethod(quant_config, bits=4)
    if algo == QuantAlgo.W4A16_AWQ:
        return WeightOnlyGroupwiseMethod(quant_config, bits=4, asymmetric=False)
    if algo == QuantAlgo.W4A16_GPTQ:
        return WeightOnlyGroupwiseMethod(quant_config, bits=4, asymmetric=True)
    if algo == QuantAlgo.W4A8_AWQ:
        return W4A8QServeMethod(quant_config)
    if algo in (QuantAlgo.W8A8_SQ_PER_CHANNEL,
                QuantAlgo.W8A8_SQ_PER_CHANNEL_PER_TOKEN_PLUGIN):
        return SmoothQuantMethod(quant_config)
    if algo in (QuantAlgo.FP8, QuantAlgo.FP8_PER_CHANNEL_PER_TOKEN):
        return Fp8QdqMethod(quant_config)
    if algo == QuantAlgo.FP8_BLOCK_SCALES:
        return Fp8BlockwiseMethod(quant_config)
    if algo == QuantAlgo.NVFP4:
        return Fp4GroupwiseMethod(quant_config, flavor="nvfp4")
    if algo == QuantAlgo.MXFP4:
        return Fp4GroupwiseMethod(quant_config, flavor="mxfp4")
    raise NotImplementedError(f"quant algo {algo} not yet supported")
