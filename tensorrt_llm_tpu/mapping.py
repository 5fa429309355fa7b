"""Parallelism topology: rank/axis bookkeeping plus the JAX device mesh.

TPU-native analog of the reference ``Mapping`` (reference:
tensorrt_llm/mapping.py:36-688). The reference does rank⇄(tp, pp, cp, ep)
coordinate math for NCCL groups; here the same factorization instead
produces a ``jax.sharding.Mesh`` with named axes, and all collectives are
inserted by GSPMD from sharding annotations. We keep the explicit facade
because the host runtime (scheduler, executor, weight loader) still needs
to reason about the topology symbolically.

Mesh axis convention (outer → inner, matching ICI locality preferences:
tp innermost so tensor-parallel collectives ride the fastest links):

    ("dp", "pp", "cp", "tp")

MoE layers re-factor the (cp, tp) submesh into (moe_ep, moe_tp).
"""
from __future__ import annotations

import dataclasses
from enum import IntEnum
from typing import Optional, Sequence

import numpy as np


class CpType(IntEnum):
    """Context-parallel flavors (reference: tensorrt_llm/mapping.py:25-33)."""
    ULYSSES = 0
    RING = 1
    STAR = 2
    HELIX = 3


@dataclasses.dataclass(frozen=True)
class Mapping:
    """World topology: world = dp * pp * cp * tp; moe_ep * moe_tp == cp * tp.

    ``enable_attention_dp`` mirrors the reference's attention-DP mode where
    attention weights are replicated and requests are partitioned across the
    tp group (reference: tensorrt_llm/mapping.py:396-450).
    """
    world_size: int = 1
    tp_size: int = 1
    pp_size: int = 1
    cp_size: int = 1
    dp_size: int = 1
    moe_tp_size: int = -1
    moe_ep_size: int = -1
    enable_attention_dp: bool = False
    # DWDP (reference: _torch/pyexecutor/dwdp.py, blog19): weights live
    # sharded across the dp replicas and are all-gathered layer-by-layer
    # inside the scan — replica weight memory scales 1/dp at rest
    enable_dwdp: bool = False
    cp_type: CpType = CpType.ULYSSES
    rank: int = 0

    def __post_init__(self):
        object.__setattr__(self, "moe_ep_size",
                           1 if self.moe_ep_size == -1 else self.moe_ep_size)
        if self.moe_tp_size == -1:
            # the MoE submesh refactors the full (cp, tp) block
            object.__setattr__(
                self, "moe_tp_size",
                self.tp_size * self.cp_size // self.moe_ep_size)
        expected = self.tp_size * self.pp_size * self.cp_size * self.dp_size
        if self.world_size != expected:
            raise ValueError(
                f"world_size ({self.world_size}) != dp*pp*cp*tp "
                f"({self.dp_size}*{self.pp_size}*{self.cp_size}*{self.tp_size})")
        if self.moe_tp_size * self.moe_ep_size != self.tp_size * self.cp_size:
            raise ValueError(
                f"moe_tp*moe_ep ({self.moe_tp_size}*{self.moe_ep_size}) must equal "
                f"cp*tp ({self.cp_size}*{self.tp_size})")

    # ------------------------------------------------------------------ #
    # Coordinate math (kept for parity with reference rank accessors)
    # ------------------------------------------------------------------ #
    @property
    def tp_rank(self) -> int:
        return self.rank % self.tp_size

    @property
    def cp_rank(self) -> int:
        return (self.rank // self.tp_size) % self.cp_size

    @property
    def pp_rank(self) -> int:
        return (self.rank // (self.tp_size * self.cp_size)) % self.pp_size

    @property
    def dp_rank(self) -> int:
        return self.rank // (self.tp_size * self.cp_size * self.pp_size)

    def has_tp(self) -> bool:
        return self.tp_size > 1

    def has_pp(self) -> bool:
        return self.pp_size > 1

    def has_cp(self) -> bool:
        return self.cp_size > 1

    def has_moe_ep(self) -> bool:
        return self.moe_ep_size > 1

    def is_first_pp_rank(self) -> bool:
        return self.pp_rank == 0

    def is_last_pp_rank(self) -> bool:
        return self.pp_rank == self.pp_size - 1

    def pp_layers(self, num_layers: int,
                  pp_partition: Optional[Sequence[int]] = None) -> list[range]:
        """Layer ranges per pipeline stage (reference: mapping.py:317-340).

        Returns a list of ``range`` objects, one per pp stage. With an
        explicit ``pp_partition`` (list of layer counts per stage, must sum
        to num_layers) that partition is honored; otherwise layers are split
        as evenly as possible with the remainder given to later stages.
        """
        if pp_partition is not None:
            if sum(pp_partition) != num_layers or len(pp_partition) != self.pp_size:
                raise ValueError(
                    f"pp_partition {pp_partition} incompatible with "
                    f"{num_layers} layers / pp={self.pp_size}")
            counts = list(pp_partition)
        else:
            base = num_layers // self.pp_size
            rem = num_layers % self.pp_size
            counts = [base + (1 if i >= self.pp_size - rem else 0)
                      for i in range(self.pp_size)]
        ranges = []
        start = 0
        for c in counts:
            ranges.append(range(start, start + c))
            start += c
        return ranges

    # ------------------------------------------------------------------ #
    # JAX mesh
    # ------------------------------------------------------------------ #
    def build_mesh(self, devices=None) -> "jax.sharding.Mesh":  # noqa: F821
        """Build the device mesh with axes (dp, pp, cp, tp).

        ``devices``: optional explicit device list (len == world_size);
        defaults to ``jax.devices()``.
        """
        import jax
        from jax.sharding import Mesh

        if devices is None:
            devices = jax.devices()
        if len(devices) < self.world_size:
            raise ValueError(
                f"need {self.world_size} devices, have {len(devices)}")
        devices = np.asarray(devices[:self.world_size]).reshape(
            self.dp_size, self.pp_size, self.cp_size, self.tp_size)
        return Mesh(devices, axis_names=("dp", "pp", "cp", "tp"))

    def build_moe_mesh(self, devices=None) -> "jax.sharding.Mesh":  # noqa: F821
        """Mesh with the (cp, tp) block refactored as (ep, moe_tp) for MoE."""
        import jax
        from jax.sharding import Mesh

        if devices is None:
            devices = jax.devices()
        devices = np.asarray(devices[:self.world_size]).reshape(
            self.dp_size, self.pp_size, self.moe_ep_size, self.moe_tp_size)
        return Mesh(devices, axis_names=("dp", "pp", "ep", "tp"))

    @classmethod
    def from_sizes(cls, tp: int = 1, pp: int = 1, cp: int = 1, dp: int = 1,
                   moe_tp: int = -1, moe_ep: int = -1,
                   enable_attention_dp: bool = False,
                   enable_dwdp: bool = False,
                   cp_type: "CpType" = CpType.ULYSSES) -> "Mapping":
        return cls(world_size=tp * pp * cp * dp, tp_size=tp, pp_size=pp,
                   cp_size=cp, dp_size=dp, moe_tp_size=moe_tp,
                   moe_ep_size=moe_ep,
                   enable_attention_dp=enable_attention_dp,
                   enable_dwdp=enable_dwdp, cp_type=cp_type)
