"""Lazy, memory-mapped state-dict over (sharded) safetensors.

Behavioral reference: the reference's streamed weight loading
(tensorrt_llm/_torch/models/checkpoints/hf/weight_loader.py — mmap'd
safetensors shards, per-tensor materialization) vs round-1's
load-everything-into-RAM. ``safetensors.safe_open`` memory-maps each
shard; tensors materialize one at a time as the model loaders stack
and quantize them, so peak host memory is one tensor (plus the
quantized output), not the whole checkpoint. Supports both flat
directories of ``*.safetensors`` and HF sharded checkpoints with a
``model.safetensors.index.json``.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Mapping

import numpy as np


class LazyStateDict(Mapping):
    """dict-like view: name -> np.ndarray materialized on access."""

    def __init__(self, path: Path):
        from safetensors import safe_open
        self.path = Path(path)
        self._handles: Dict[str, object] = {}   # file -> safe_open handle
        self._where: Dict[str, str] = {}        # tensor name -> file

        index = self.path / "model.safetensors.index.json"
        if index.exists():
            weight_map = json.loads(index.read_text())["weight_map"]
            files = sorted(set(weight_map.values()))
            for fname in files:
                self._handles[fname] = safe_open(
                    str(self.path / fname), framework="numpy")
            self._where = dict(weight_map)
        else:
            files = sorted(self.path.glob("*.safetensors"))
            if not files:
                raise FileNotFoundError(
                    f"no safetensors under {self.path}")
            for f in files:
                h = safe_open(str(f), framework="numpy")
                self._handles[f.name] = h
                for name in h.keys():
                    self._where[name] = f.name

    def __getitem__(self, name: str) -> np.ndarray:
        fname = self._where[name]
        return self._handles[fname].get_tensor(name)

    def __contains__(self, name) -> bool:
        return name in self._where

    def __iter__(self) -> Iterator[str]:
        return iter(self._where)

    def __len__(self) -> int:
        return len(self._where)

    def get(self, name, default=None):
        return self[name] if name in self._where else default

    def keys(self):
        return self._where.keys()

    def items(self):
        for k in self._where:
            yield k, self[k]

    # dict()-style updates used by callers layering overrides on top
    def materialize(self) -> Dict[str, np.ndarray]:
        return {k: self[k] for k in self._where}
