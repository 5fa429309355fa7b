"""Wide-EP: expert replication + online load balancing.

Behavioral reference: tensorrt_llm/_torch/modules/fused_moe/
fused_moe_wide_ep.py + the EPLB balancer (moe_load_balancer.py): hot
experts get REPLICA slots spread across EP ranks so their tokens split,
and placement is recomputed from observed per-expert loads. TPU shape:
expert weights are gathered into a SLOT array ``W_slots = W[placement]``
(one GSPMD gather per rebalance — rare), the slot axis shards over the
ep mesh axes, and routing maps (expert, token) → one of the expert's
replica slots round-robin, after which the existing shard_map grouped
GEMM machinery runs unchanged on slot ids.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def eplb_placement(loads: Sequence[float], num_slots: int,
                   num_shards: int) -> np.ndarray:
    """Greedy EPLB: every expert gets ≥1 slot; remaining slots go to the
    heaviest experts (largest remainder on load share); then replicas
    are dealt onto shards by balanced greedy packing so each shard's
    expected load is even. Returns ``placement[num_slots] -> expert``,
    laid out shard-major (slots [s*S_loc:(s+1)*S_loc] live on shard s).
    """
    loads = np.asarray(loads, np.float64)
    E = loads.shape[0]
    if num_slots < E:
        raise ValueError(f"num_slots {num_slots} < num_experts {E}")
    if num_slots % num_shards:
        raise ValueError("num_slots must divide evenly across shards")
    total = max(loads.sum(), 1e-9)
    share = loads / total * num_slots
    replicas = np.maximum(1, np.floor(share).astype(np.int64))
    # trim overshoot from the least-loaded replicated experts
    while replicas.sum() > num_slots:
        cand = np.where(replicas > 1)[0]
        victim = cand[np.argmin(loads[cand] / replicas[cand])]
        replicas[victim] -= 1
    # hand leftover slots to the experts with the highest per-replica load
    while replicas.sum() < num_slots:
        replicas[np.argmax(loads / replicas)] += 1

    # balanced greedy packing of replica units onto shards
    units = []          # (per-replica load, expert)
    for e in range(E):
        for _ in range(int(replicas[e])):
            units.append((loads[e] / replicas[e], e))
    units.sort(reverse=True)
    S_loc = num_slots // num_shards
    shard_load = np.zeros(num_shards)
    shard_slots: List[List[int]] = [[] for _ in range(num_shards)]
    for w, e in units:
        order = np.argsort(shard_load)
        for s in order:
            # avoid two replicas of one expert on one shard when possible
            if len(shard_slots[s]) < S_loc and e not in shard_slots[s]:
                break
        else:
            s = next(t for t in order if len(shard_slots[t]) < S_loc)
        shard_slots[s].append(e)
        shard_load[s] += w
    placement = np.concatenate(
        [np.asarray(sl, np.int32) for sl in shard_slots])
    return placement


def build_replica_tables(placement: np.ndarray, num_experts: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(rep_count[E], rep_slots[E, max_rep]) — slot list per expert,
    padded with the first replica (harmless for modulo round-robin)."""
    slots_of = [[] for _ in range(num_experts)]
    for s, e in enumerate(np.asarray(placement)):
        slots_of[int(e)].append(s)
    max_rep = max(len(v) for v in slots_of)
    rep_count = np.asarray([len(v) for v in slots_of], np.int32)
    rep_slots = np.zeros((num_experts, max_rep), np.int32)
    for e, v in enumerate(slots_of):
        for j in range(max_rep):
            rep_slots[e, j] = v[j % len(v)]
    return rep_count, rep_slots
