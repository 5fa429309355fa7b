"""Prequantized-checkpoint ingestion: AWQ / GPTQ / ModelOpt formats.

TPU-native analog of the reference's checkpoint-driven quantization flow
(reference: tensorrt_llm/quantization/quantize_by_modelopt.py:1404 reads
ModelOpt ``hf_quant_config.json``; _torch/modules/linear.py:2287 W4A16_AWQ
/ :2431 W4A8_AWQ ingest qweight/qzeros/scales layouts; weight
pre-processing cutlass_kernels/cutlass_preprocessors.cpp). Instead of
re-quantizing bf16 weights at load (which loses the checkpoint's
activation-aware scales and clipping), this module unpacks the
checkpoint's OWN integer weights + scales + zero points into the
engine's internal groupwise representation, so runtime dequantization
reproduces the published AWQ/GPTQ math bit-for-bit:

    w = (q - z) * s        q, z unsigned 4-bit, s per-(group, out-column)

Supported container formats:
  * AutoAWQ "gemm" (HF `quantization_config.quant_method == "awq"`):
      qweight i32[K, N/8] nibble-interleaved order [0,2,4,6,1,3,5,7],
      qzeros  i32[K/G, N/8] same packing, scales f16[K/G, N].
  * AutoGPTQ (quant_method == "gptq"):
      qweight i32[K/8, N] sequential nibbles along K,
      qzeros  i32[K/G, N/8] sequential nibbles along N, stored as z-1
      (the classic +1 offset; `checkpoint_format: gptq_v2` disables it),
      scales f16[K/G, N]; act-order (g_idx) rejected for now.
  * ModelOpt unified-HF (`hf_quant_config.json`): fp8 per-tensor
      (weight fp8 + weight_scale) and int4-awq blocks; per-layer
      `*.kv_cache_scaling_factor` tensors feed the KV quant scales.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ..logger import logger
from .mode import KvCacheQuantAlgo, QuantAlgo

# AutoAWQ nibble interleave: packed nibble i holds logical column
# col*8 + AWQ_ORDER[i] (WQLinear_GEMM.from_linear pack loop)
AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


@dataclasses.dataclass
class PrequantizedWeight:
    """A checkpoint-quantized projection already in the engine's internal
    groupwise layout: ``weight`` i8[K, N] (raw quantized values),
    ``weight_scale`` f32[K/G, N], ``weight_zero`` f32[K/G, N] or None
    (dequant: (q - z) * s — matches ops/quant.dequantize_weight).
    For fp8 per-tensor: weight fp8[K, N] + scalar scale."""
    weight: np.ndarray
    weight_scale: np.ndarray
    weight_zero: Optional[np.ndarray] = None
    group_size: int = 128
    bits: int = 4

    def transpose(self):
        return self  # already [K(in), N(out)]


@dataclasses.dataclass
class PrequantConfig:
    """What the checkpoint says about its own quantization."""
    fmt: str                                   # awq | gptq | modelopt
    quant_algo: Optional[QuantAlgo]
    group_size: int = 128
    has_zero_point: bool = True
    gptq_v2: bool = False                      # zeros stored without -1
    kv_cache_quant_algo: Optional[KvCacheQuantAlgo] = None
    exclude_modules: List[str] = dataclasses.field(default_factory=list)


def detect_prequantized(path) -> Optional[PrequantConfig]:
    """Look for ModelOpt ``hf_quant_config.json`` or an HF
    ``quantization_config`` block and describe the checkpoint format."""
    path = Path(path)
    mo = path / "hf_quant_config.json"
    if mo.exists():
        q = json.loads(mo.read_text()).get("quantization", {})
        algo_name = (q.get("quant_algo") or "").upper()
        algo = None
        if algo_name:
            try:
                algo = QuantAlgo[algo_name]
            except KeyError:
                logger.warning("hf_quant_config quant_algo %r not "
                               "supported; ignoring weight quant",
                               algo_name)
        kv = None
        kv_name = (q.get("kv_cache_quant_algo") or "").upper()
        if kv_name:
            try:
                kv = KvCacheQuantAlgo[kv_name]
            except KeyError:
                logger.warning("kv_cache_quant_algo %r not supported",
                               kv_name)
        return PrequantConfig(
            fmt="modelopt", quant_algo=algo,
            group_size=q.get("group_size") or 128,
            has_zero_point=bool(q.get("has_zero_point", False)),
            kv_cache_quant_algo=kv,
            exclude_modules=q.get("exclude_modules") or [])
    cfg_file = path / "config.json"
    if not cfg_file.exists():
        return None
    qc = json.loads(cfg_file.read_text()).get("quantization_config")
    if not qc:
        return None
    method = (qc.get("quant_method") or "").lower()
    bits = int(qc.get("bits", 4))
    if method == "awq":
        if (qc.get("version") or "gemm").lower() not in ("gemm", "gemv"):
            raise NotImplementedError(
                f"AWQ version {qc.get('version')!r} not supported "
                "(gemm/gemv packing only)")
        if bits != 4:
            raise NotImplementedError("AWQ ingestion supports 4-bit only")
        return PrequantConfig(
            fmt="awq", quant_algo=QuantAlgo.W4A16_AWQ,
            group_size=int(qc.get("group_size", 128)),
            has_zero_point=bool(qc.get("zero_point", True)),
            exclude_modules=qc.get("modules_to_not_convert") or [])
    if method == "gptq":
        if qc.get("desc_act"):
            raise NotImplementedError(
                "GPTQ act-order (desc_act=True) checkpoints are not "
                "supported: reorder offline with desc_act=False")
        if bits not in (4, 8):
            raise NotImplementedError("GPTQ ingestion supports 4/8-bit")
        algo = QuantAlgo.W4A16_GPTQ if bits == 4 else QuantAlgo.W8A16
        return PrequantConfig(
            fmt="gptq", quant_algo=algo,
            group_size=int(qc.get("group_size", 128)),
            has_zero_point=True,
            gptq_v2=(qc.get("checkpoint_format") == "gptq_v2"))
    logger.warning("quantization_config method %r not supported; "
                   "loading will fail unless weights are full-precision",
                   method)
    return None


# --------------------------------------------------------------------- #
# Unpackers
# --------------------------------------------------------------------- #
def _unpack_nibbles_i32(packed: np.ndarray) -> np.ndarray:
    """i32[..., W] -> u8[..., W, 8] of nibbles (LSB nibble first)."""
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    u = packed.astype(np.uint32)
    return ((u[..., None] >> shifts) & 0xF).astype(np.uint8)


def unpack_awq_gemm(qweight: np.ndarray, qzeros: np.ndarray,
                    scales: np.ndarray, group_size: int
                    ) -> PrequantizedWeight:
    """AutoAWQ WQLinear_GEMM tensors -> internal groupwise layout."""
    K = qweight.shape[0]
    nib = _unpack_nibbles_i32(qweight)            # [K, N/8, 8] nibble i
    N = nib.shape[1] * 8
    w = np.empty((K, nib.shape[1], 8), np.uint8)
    w[:, :, AWQ_ORDER] = nib                      # logical col order
    w = w.reshape(K, N)
    znib = _unpack_nibbles_i32(qzeros)            # [K/G, N/8, 8]
    z = np.empty_like(znib)
    z[:, :, AWQ_ORDER] = znib
    z = z.reshape(qzeros.shape[0], N)
    return PrequantizedWeight(
        weight=w.astype(np.int8),
        weight_scale=scales.astype(np.float32),
        weight_zero=z.astype(np.float32),
        group_size=group_size, bits=4)


def unpack_gptq(qweight: np.ndarray, qzeros: np.ndarray,
                scales: np.ndarray, group_size: int, bits: int = 4,
                v2: bool = False) -> PrequantizedWeight:
    """AutoGPTQ tensors -> internal groupwise layout."""
    if bits == 4:
        nib = _unpack_nibbles_i32(qweight)        # [K/8, N, 8]
        K = qweight.shape[0] * 8
        w = nib.transpose(0, 2, 1).reshape(K, qweight.shape[1])
        znib = _unpack_nibbles_i32(qzeros)        # [K/G, N/8, 8]
        z = znib.reshape(qzeros.shape[0], -1)
    else:  # 8-bit: 4 values per i32
        shifts = np.arange(0, 32, 8, dtype=np.uint32)
        u = qweight.astype(np.uint32)
        vals = ((u[:, None, :] >> shifts[None, :, None]) & 0xFF
                ).astype(np.uint8)                # [K/4, 4, N]
        K = qweight.shape[0] * 4
        w = vals.reshape(K, qweight.shape[1])
        uz = qzeros.astype(np.uint32)
        zvals = ((uz[:, :, None] >> shifts) & 0xFF).astype(np.uint8)
        z = zvals.reshape(qzeros.shape[0], -1)
    z = z.astype(np.int32)
    if not v2:
        # classic AutoGPTQ stores zero-1
        z = z + 1
    w = w.astype(np.int32)
    if bits == 8:
        # shift unsigned 0..255 into int8 range; (q-128)-(z-128) == q-z
        w -= 128
        z -= 128
    return PrequantizedWeight(
        weight=w.astype(np.int8),
        weight_scale=scales.astype(np.float32),
        weight_zero=z.astype(np.float32),
        group_size=group_size, bits=bits)


def dequantize_prequant(pq: PrequantizedWeight,
                        dtype=np.float32) -> np.ndarray:
    """Reference host dequant — used by tests and the fallback path."""
    K, N = pq.weight.shape
    G = pq.group_size
    qg = pq.weight.astype(np.float32).reshape(K // G, G, N)
    if pq.weight_zero is not None:
        qg = qg - pq.weight_zero[:, None, :]
    return (qg * pq.weight_scale[:, None, :]).reshape(K, N).astype(dtype)


# --------------------------------------------------------------------- #
# State-dict conversion
# --------------------------------------------------------------------- #
def convert_state_dict(sd: Dict[str, np.ndarray],
                       cfg: PrequantConfig) -> Dict[str, Any]:
    """Rewrite a prequantized state dict so each ``<name>.weight`` entry
    is a :class:`PrequantizedWeight`; model loaders pass these through
    :func:`~..models.modeling_utils.quantize_linear` untouched."""
    out: Dict[str, Any] = {}
    done = set()
    for name in list(sd):
        if name.endswith(".qweight"):
            base = name[:-len(".qweight")]
            qweight = sd[name]
            qzeros = sd.get(base + ".qzeros")
            scales = sd.get(base + ".scales")
            if scales is None:
                raise ValueError(f"{base}: qweight without scales")
            if cfg.fmt == "awq":
                pq = unpack_awq_gemm(qweight, qzeros, scales,
                                     cfg.group_size)
            else:
                pq = unpack_gptq(qweight, qzeros, scales, cfg.group_size,
                                 bits=4, v2=cfg.gptq_v2)
            out[base + ".weight"] = pq
            done.update((name, base + ".qzeros", base + ".scales",
                         base + ".g_idx"))
        elif name.endswith(".weight_scale") and \
                cfg.quant_algo == QuantAlgo.NVFP4 and \
                (name[:-len(".weight_scale")] + ".weight_scale_2") in sd:
            # ModelOpt NVFP4 (reference: linear.py:1266): weight u8
            # [N, K/2] two e2m1 nibbles per byte, weight_scale e4m3
            # [N, K/16] relative group scales, weight_scale_2 fp32
            # global. Unpacked to the int8 e2m1*2 code storage of
            # Fp4GroupwiseMethod (ops/quant.quantize_weight_fp4).
            base = name[:-len(".weight_scale")]
            wq = sd.get(base + ".weight")
            if wq is None or wq.dtype != np.uint8:
                continue
            from .mxfp4 import _LUT
            lo = _LUT[wq & 0xF]          # element 2i
            hi = _LUT[wq >> 4]           # element 2i+1
            vals = np.stack([lo, hi], axis=-1).reshape(
                wq.shape[0], wq.shape[1] * 2)          # [N, K] e2m1 codes
            s_rel = np.asarray(sd[name])
            if s_rel.dtype != np.float32:
                s_rel = s_rel.astype(np.float32)
            s2 = float(np.asarray(sd[base + ".weight_scale_2"],
                                  np.float32).reshape(()))
            half = (s_rel * s2 / 2.0)                  # [N, K/16]
            out[base + ".weight"] = PrequantizedWeight(
                weight=np.ascontiguousarray(
                    (vals.T * 2.0).astype(np.int8)),   # [K, N] codes*2
                weight_scale=np.ascontiguousarray(half.T),  # [K/16, N]
                weight_zero=None, group_size=16, bits=8)
            done.update((name, base + ".weight",
                         base + ".weight_scale_2",
                         base + ".input_scale"))
        elif name.endswith(".weight_scale"):
            # ModelOpt fp8: weight (fp8) + per-tensor weight_scale
            base = name[:-len(".weight_scale")]
            w = sd.get(base + ".weight")
            if w is not None and w.dtype.itemsize == 1:
                out[base + ".weight"] = PrequantizedWeight(
                    weight=w, weight_scale=sd[name].astype(np.float32),
                    weight_zero=None, group_size=0, bits=8)
                done.update((name, base + ".weight"))
    for name, v in sd.items():
        if name not in done and name not in out:
            out[name] = v
    return out


def extract_kv_scales(sd: Dict[str, Any],
                      algo: KvCacheQuantAlgo) -> Optional[np.ndarray]:
    """Collect per-layer ``kv_cache_scaling_factor`` tensors (ModelOpt
    convention; reference: kv_scale_orig_quant plumbing
    attentionOp.cpp:919) into an [L] array, or None if absent."""
    per_layer: Dict[int, float] = {}
    for name, v in sd.items():
        if name.endswith("kv_cache_scaling_factor"):
            parts = name.split(".")
            for p in parts:
                if p.isdigit():
                    per_layer[int(p)] = float(np.asarray(v).reshape(-1)[0])
                    break
    if not per_layer:
        return None
    L = max(per_layer) + 1
    out = np.ones(L, np.float32)
    for i, s in per_layer.items():
        out[i] = s
    return out
