"""Multi-adapter LoRA serving.

TPU-native analog of the reference PEFT stack (reference:
cpp/include/tensorrt_llm/batch_manager/peftCacheManager.h:102 — pages
adapter weights; tensorrt_llm/_torch/peft/lora/layer.py:47 LoraModuleType;
grouped-GEMM LoRA op cpp/tensorrt_llm/kernels/lora/). Design:

  * Adapters live in a host-side cache keyed by ``lora_task_id``; active
    adapters are stacked into device tensors [n_slots, r, ...] so the
    per-token adapter application is two batched einsums selected by a
    per-token slot id — the XLA equivalent of the grouped LoRA GEMM.
  * ``LoraLayerWeights``: A [K, r], B [r, N] per target module, padded to
    a common ``max_rank`` so slots stack into one array.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

TARGET_MODULES = ("q", "k", "v", "o", "gate", "up", "down")


@dataclasses.dataclass
class LoraConfig:
    max_lora_rank: int = 16
    max_loras: int = 8             # device slots
    max_cpu_loras: int = 64        # host cache entries
    lora_target_modules: Optional[List[str]] = None


@dataclasses.dataclass
class LoraRequest:
    lora_name: str
    lora_int_id: int
    lora_path: str


@dataclasses.dataclass
class LoraLayerWeights:
    """Per (layer, module) pair: A [K, r], B [r, N] (already transposed
    to x@A@B layout), scale = alpha / r. ``mag`` is the DoRA
    column-scale m / ||W + scale*B@A||_col (PRE-normalized, as the
    reference requires of DoRA checkpoints — see its lora converter's
    dora normalization); None for plain LoRA."""
    a: np.ndarray
    b: np.ndarray
    scale: float
    mag: Optional[np.ndarray] = None    # [N] or raw magnitude pre-norm
    mag_is_raw: bool = False            # True until normalized vs base W


class LoraAdapter:
    def __init__(self, task_id: int, rank: int,
                 weights: Dict[str, Dict[int, LoraLayerWeights]]):
        self.task_id = task_id
        self.rank = rank
        self.weights = weights      # module -> layer -> weights

    @classmethod
    def from_hf_dir(cls, task_id: int, path: str,
                    base_sd: Optional[Dict[str, np.ndarray]] = None
                    ) -> "LoraAdapter":
        """Load a PEFT checkpoint (adapter_config.json +
        adapter_model.safetensors). DoRA checkpoints (use_dora) carry a
        ``lora_magnitude_vector`` per module; pass ``base_sd`` (the base
        model's HF state dict) to normalize it here, or call
        ``normalize_dora`` later — the runtime applies only the
        pre-normalized column scale."""
        p = Path(path)
        cfg = json.loads((p / "adapter_config.json").read_text())
        rank = cfg["r"]
        alpha = cfg.get("lora_alpha", rank)
        if cfg.get("use_rslora"):
            import math
            scale = alpha / math.sqrt(rank)
        else:
            scale = alpha / rank
        from safetensors import numpy as st_numpy
        fname = p / "adapter_model.safetensors"
        sd = st_numpy.load_file(str(fname))
        weights: Dict[str, Dict[int, LoraLayerWeights]] = {}
        mod_map = {"q_proj": "q", "k_proj": "k", "v_proj": "v",
                   "o_proj": "o", "gate_proj": "gate", "up_proj": "up",
                   "down_proj": "down"}
        for key, val in sd.items():
            # e.g. base_model.model.model.layers.3.self_attn.q_proj.lora_A.weight
            parts = key.split(".")
            is_mag = "lora_magnitude_vector" in parts
            if "lora_A" not in parts and "lora_B" not in parts \
                    and not is_mag:
                continue
            layer_idx = int(parts[parts.index("layers") + 1])
            proj = next((mod_map[m] for m in mod_map if m in parts), None)
            if proj is None:
                continue
            entry = weights.setdefault(proj, {}).setdefault(
                layer_idx, LoraLayerWeights(None, None, scale))
            if is_mag:
                entry.mag = np.asarray(val, np.float32).reshape(-1)
                entry.mag_is_raw = True
            elif "lora_A" in parts:
                entry.a = np.ascontiguousarray(val.T)  # [K, r]
            else:
                entry.b = np.ascontiguousarray(val.T)  # [r, N]
        adapter = cls(task_id, rank, weights)
        if base_sd is not None:
            adapter.normalize_dora(base_sd)
        return adapter

    def normalize_dora(self, base_sd: Dict[str, np.ndarray]) -> None:
        """Turn raw DoRA magnitudes into runtime column scales:
        mag <- m / ||W + scale * B@A||_col (norm over the input dim,
        matching peft's weight_norm over W [out, in] dim=1)."""
        hf_name = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
                   "v": "self_attn.v_proj", "o": "self_attn.o_proj",
                   "gate": "mlp.gate_proj", "up": "mlp.up_proj",
                   "down": "mlp.down_proj"}
        for mod, per_layer in self.weights.items():
            for layer, w in per_layer.items():
                if w.mag is None or not w.mag_is_raw:
                    continue
                key = f"model.layers.{layer}.{hf_name[mod]}.weight"
                base = np.asarray(base_sd[key], np.float32)  # [N, K]
                # my A/B are x@A@B layout: delta W^T = A@B [K, N]
                delta = (w.a.astype(np.float32)
                         @ w.b.astype(np.float32)) * w.scale
                norm = np.linalg.norm(base.T + delta, axis=0)   # [N]
                w.mag = w.mag / np.maximum(norm, 1e-12)
                w.mag_is_raw = False

    @property
    def has_dora(self) -> bool:
        return any(w.mag is not None for per in self.weights.values()
                   for w in per.values())


class LoraManager:
    """Host cache + device slot packing (the PeftCacheManager role)."""

    def __init__(self, config: LoraConfig, num_layers: int):
        self.config = config
        self.num_layers = num_layers
        self._host_cache: Dict[int, LoraAdapter] = {}
        self._slot_of: Dict[int, int] = {}
        self._slots: List[Optional[int]] = [None] * config.max_loras
        self._device_stacks = None   # rebuilt on slot change

    def add_adapter(self, adapter: LoraAdapter) -> None:
        if len(self._host_cache) >= self.config.max_cpu_loras:
            # evict an unreferenced adapter (FIFO)
            for tid in list(self._host_cache):
                if tid not in self._slot_of:
                    del self._host_cache[tid]
                    break
        self._host_cache[adapter.task_id] = adapter

    def load_from_path(self, task_id: int, path: str) -> None:
        self.add_adapter(LoraAdapter.from_hf_dir(task_id, path))

    def activate(self, task_id: int) -> int:
        """Pin an adapter to a device slot; returns the slot id."""
        if task_id in self._slot_of:
            return self._slot_of[task_id]
        if task_id not in self._host_cache:
            raise KeyError(f"unknown lora_task_id {task_id}")
        ad = self._host_cache[task_id]
        if any(w.mag_is_raw for per in ad.weights.values()
               for w in per.values()):
            raise ValueError(
                f"DoRA adapter {task_id} has unnormalized magnitudes: "
                "call adapter.normalize_dora(base_state_dict) first (the "
                "runtime applies pre-normalized column scales)")
        try:
            slot = self._slots.index(None)
        except ValueError:
            raise RuntimeError("no free LoRA device slots") from None
        self._slots[slot] = task_id
        self._slot_of[task_id] = slot
        self._device_stacks = None
        return slot

    def deactivate(self, task_id: int) -> None:
        slot = self._slot_of.pop(task_id, None)
        if slot is not None:
            self._slots[slot] = None
            self._device_stacks = None

    def slot_for(self, task_id: Optional[int]) -> int:
        """-1 = no adapter."""
        if task_id is None:
            return -1
        return self._slot_of.get(task_id, -1)

    def device_stacks(self, module_shapes: Dict[str, tuple], dtype):
        """Stacked adapter tensors per module, layer-major so they ride
        the model's layer scan:
        {module: (A [L, n_slots+1, K, r], B [L, n_slots+1, r, N],
                  scale [n_slots+1], mag [L, n_slots+1, N])} — slot
        n_slots is the zero adapter used for tokens without LoRA; mag is
        the DoRA column scale (all-ones for plain LoRA slots)."""
        if self._device_stacks is not None:
            return self._device_stacks
        import jax.numpy as jnp
        r = self.config.max_lora_rank
        n = self.config.max_loras
        L = self.num_layers
        any_dora = any(self._host_cache[tid].has_dora
                       for tid in self._slots if tid is not None)
        stacks = {}
        for mod, (K, N) in module_shapes.items():
            A = np.zeros((L, n + 1, K, r), np.float32)
            B = np.zeros((L, n + 1, r, N), np.float32)
            scale = np.zeros(n + 1, np.float32)
            mag = np.ones((L, n + 1, N), np.float32) if any_dora else None
            for slot, tid in enumerate(self._slots):
                if tid is None:
                    continue
                ad = self._host_cache[tid]
                per_layer = ad.weights.get(mod, {})
                for layer, w in per_layer.items():
                    if w.a is None or w.b is None:
                        continue
                    rr = w.a.shape[1]
                    A[layer, slot, :, :rr] = w.a
                    B[layer, slot, :rr, :] = w.b
                    if w.mag is not None and mag is not None:
                        mag[layer, slot] = w.mag
                scale[slot] = next(iter(per_layer.values())).scale \
                    if per_layer else 0.0
            stacks[mod] = (jnp.asarray(A, dtype), jnp.asarray(B, dtype),
                           jnp.asarray(scale),
                           None if mag is None
                           else jnp.asarray(mag, dtype))
        self._device_stacks = stacks
        return stacks


def apply_lora(x, base_out, a_layer, b_layer, scales, slot_ids,
               mag_layer=None):
    """Per-token LoRA application inside the jitted forward (one layer):

        out = mag[slot] * (out + scale[slot] * ((x @ A[slot]) @ B[slot]))

    a_layer [n_slots+1, K, r], b_layer [n_slots+1, r, N] are this layer's
    slices (the stacks ride the layer scan); slot_ids i32[T], -1 → zero
    slot. Batched einsum over gathered per-token adapter weights — the
    grouped-GEMM analog (ref: thop/loraOp.cpp). mag_layer
    [n_slots+1, N] is the DoRA column scale (ones when absent; peft:
    y = m/||W+sBA|| * (xW + s*xAB)). Prefill with many distinct
    adapters should sort tokens by slot (future work).
    """
    import jax.numpy as jnp
    n_zero = a_layer.shape[0] - 1
    sid = jnp.where(slot_ids >= 0, slot_ids, n_zero)
    a = a_layer[sid]                     # [T, K, r]
    b = b_layer[sid]                     # [T, r, N]
    s = scales[sid]                      # [T]
    h = jnp.einsum("tk,tkr->tr", x, a)
    delta = jnp.einsum("tr,trn->tn", h, b)
    out = base_out + (delta * s[:, None]).astype(base_out.dtype)
    if mag_layer is not None:
        out = out * mag_layer[sid].astype(out.dtype)
    return out
