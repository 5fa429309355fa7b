"""Online wide-EP load tracking + automatic rebalance trigger.

Role analog of the reference's MoE load balancer statistics loop
(reference: _torch/modules/fused_moe/moe_load_balancer.py — per-expert
statistic collection in forward, background weight redistribution via
cpp/tensorrt_llm/runtime/moeLoadBalancer/moeLoadBalancer.cpp). TPU
shape: the step program emits per-expert routed-token counts [L, E]
(mixtral.forward collect_moe_stats); the executor feeds them here; when
the windowed load skew crosses the threshold, the tracker recomputes
the EPLB placement and installs replica-slot weights through
``engine.rebalance_moe`` — mid-serve, output-invariant (routing maps an
expert to its replica slots round-robin; the math is identical).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..logger import logger


class MoeLoadTracker:
    """EMA per-expert load accumulator with a skew-triggered rebalance.

    Config (moe_config.load_balancer dict):
      interval:        iterations between trigger checks (default 64)
      skew_threshold:  max-load / mean-load ratio to trigger (default 1.5)
      ema:             smoothing factor for iteration counts (default 0.2)
      min_samples:     iterations with stats before first trigger (16)
    """

    def __init__(self, engine, interval: int = 64,
                 skew_threshold: float = 1.5, ema: float = 0.2,
                 min_samples: int = 16, **_ignored):
        self.engine = engine
        self.interval = max(1, int(interval))
        self.skew_threshold = float(skew_threshold)
        self.ema = float(ema)
        self.min_samples = int(min_samples)
        self.loads: Optional[np.ndarray] = None     # EMA [E]
        self.samples = 0
        self.iters_since_check = 0
        self.rebalances = 0
        self.last_skew = 1.0

    def observe(self, counts) -> None:
        """Feed one iteration's [L, E] (or [E]) routed-token counts."""
        c = np.asarray(counts, np.float64)
        if c.size == 0:
            return
        if c.ndim == 2:
            c = c.sum(axis=0)
        if not c.any():
            return
        if self.loads is None:
            self.loads = c
        else:
            self.loads = (1 - self.ema) * self.loads + self.ema * c
        self.samples += 1
        self.iters_since_check += 1
        if (self.samples >= self.min_samples
                and self.iters_since_check >= self.interval):
            self.iters_since_check = 0
            self.maybe_rebalance()

    def skew(self) -> float:
        if self.loads is None or not self.loads.any():
            return 1.0
        return float(self.loads.max() / max(self.loads.mean(), 1e-9))

    def maybe_rebalance(self) -> bool:
        self.last_skew = self.skew()
        if self.last_skew < self.skew_threshold:
            return False
        try:
            self.engine.rebalance_moe(self.loads)
        except ValueError:
            return False     # model has no wide-EP weights
        self.rebalances += 1
        logger.info("wide-EP auto-rebalance #%d (skew %.2f >= %.2f)",
                    self.rebalances, self.last_skew,
                    self.skew_threshold)
        return True
