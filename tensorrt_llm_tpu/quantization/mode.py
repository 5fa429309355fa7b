"""Quantization algorithm/mode taxonomy.

Mirrors the reference ``QuantAlgo``/``QuantMode`` semantics (reference:
tensorrt_llm/quantization/mode.py:23-104, mirrored in
cpp/tensorrt_llm/common/quantization.h). The TPU build maps these onto
XLA-native dtypes (int8/int4 via jnp.int4 packing, fp8 e4m3 native on
v5p+/v6, bf16 accumulate) and Pallas fused dequant-matmul kernels.
"""
from __future__ import annotations

from enum import Enum, Flag, auto
from typing import Optional


class QuantAlgo(str, Enum):
    """Weight/activation quantization algorithms (mode.py:23-49)."""
    NO_QUANT = "NO_QUANT"
    W8A16 = "W8A16"                       # int8 weight-only, per-channel
    W4A16 = "W4A16"                       # int4 weight-only, per-channel
    W4A16_AWQ = "W4A16_AWQ"               # int4 group-scaled (AWQ)
    W4A16_GPTQ = "W4A16_GPTQ"             # int4 group-scaled + zero points
    W4A8_AWQ = "W4A8_AWQ"
    W8A8_SQ_PER_CHANNEL = "W8A8_SQ_PER_CHANNEL"        # SmoothQuant
    W8A8_SQ_PER_TENSOR_PLUGIN = "W8A8_SQ_PER_TENSOR_PLUGIN"
    W8A8_SQ_PER_CHANNEL_PER_TOKEN_PLUGIN = "W8A8_SQ_PER_CHANNEL_PER_TOKEN_PLUGIN"
    FP8 = "FP8"                           # e4m3 per-tensor
    FP8_PER_CHANNEL_PER_TOKEN = "FP8_PER_CHANNEL_PER_TOKEN"
    FP8_BLOCK_SCALES = "FP8_BLOCK_SCALES"  # 1x128 / 128x128 (DeepSeek style)
    NVFP4 = "NVFP4"                       # 4-bit float w/ fp8 block scales
    MXFP4 = "MXFP4"
    MIXED_PRECISION = "MIXED_PRECISION"

    @property
    def is_weight_only(self) -> bool:
        return self in (QuantAlgo.W8A16, QuantAlgo.W4A16, QuantAlgo.W4A16_AWQ,
                        QuantAlgo.W4A16_GPTQ)

    @property
    def has_group_scales(self) -> bool:
        return self in (QuantAlgo.W4A16_AWQ, QuantAlgo.W4A16_GPTQ,
                        QuantAlgo.W4A8_AWQ, QuantAlgo.MXFP4, QuantAlgo.NVFP4)

    @property
    def has_zero_points(self) -> bool:
        return self == QuantAlgo.W4A16_GPTQ


class KvCacheQuantAlgo(str, Enum):
    NO_QUANT = "NO_QUANT"
    INT8 = "INT8"
    FP8 = "FP8"
    NVFP4 = "NVFP4"


class QuantMode(Flag):
    """Bitflag view used by kernels (mode.py:66-104)."""
    NONE = 0
    INT4_WEIGHTS = auto()
    INT8_WEIGHTS = auto()
    ACTIVATIONS = auto()          # quantized activations (w8a8 / fp8)
    PER_CHANNEL = auto()
    PER_TOKEN = auto()
    PER_GROUP = auto()
    INT8_KV_CACHE = auto()
    FP8_KV_CACHE = auto()
    FP8_QDQ = auto()
    NVFP4_KV_CACHE = auto()
    FP8_ROWWISE = auto()
    FP8_1x128_128x128 = auto()
    NVFP4_WEIGHTS = auto()

    @staticmethod
    def from_quant_algo(algo: Optional[QuantAlgo],
                        kv_algo: Optional[KvCacheQuantAlgo] = None) -> "QuantMode":
        mode = QuantMode.NONE
        if algo in (QuantAlgo.W8A16,):
            mode |= QuantMode.INT8_WEIGHTS | QuantMode.PER_CHANNEL
        elif algo in (QuantAlgo.W4A16,):
            mode |= QuantMode.INT4_WEIGHTS | QuantMode.PER_CHANNEL
        elif algo in (QuantAlgo.W4A16_AWQ, QuantAlgo.W4A16_GPTQ):
            mode |= QuantMode.INT4_WEIGHTS | QuantMode.PER_GROUP
        elif algo == QuantAlgo.W4A8_AWQ:
            mode |= QuantMode.INT4_WEIGHTS | QuantMode.PER_GROUP | QuantMode.ACTIVATIONS
        elif algo == QuantAlgo.W8A8_SQ_PER_CHANNEL:
            mode |= (QuantMode.INT8_WEIGHTS | QuantMode.ACTIVATIONS
                     | QuantMode.PER_CHANNEL | QuantMode.PER_TOKEN)
        elif algo == QuantAlgo.FP8:
            mode |= QuantMode.FP8_QDQ | QuantMode.ACTIVATIONS
        elif algo == QuantAlgo.FP8_PER_CHANNEL_PER_TOKEN:
            mode |= QuantMode.FP8_ROWWISE | QuantMode.ACTIVATIONS
        elif algo == QuantAlgo.FP8_BLOCK_SCALES:
            mode |= QuantMode.FP8_1x128_128x128 | QuantMode.ACTIVATIONS
        elif algo in (QuantAlgo.NVFP4, QuantAlgo.MXFP4):
            mode |= QuantMode.NVFP4_WEIGHTS | QuantMode.PER_GROUP
        if kv_algo == KvCacheQuantAlgo.INT8:
            mode |= QuantMode.INT8_KV_CACHE
        elif kv_algo == KvCacheQuantAlgo.FP8:
            mode |= QuantMode.FP8_KV_CACHE
        elif kv_algo == KvCacheQuantAlgo.NVFP4:
            mode |= QuantMode.NVFP4_KV_CACHE
        return mode

    def has_kv_cache_quant(self) -> bool:
        return bool(self & (QuantMode.INT8_KV_CACHE | QuantMode.FP8_KV_CACHE
                            | QuantMode.NVFP4_KV_CACHE))
