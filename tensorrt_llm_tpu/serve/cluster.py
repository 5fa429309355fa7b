"""Disaggregated cluster membership + auto-scaling hints.

Role of the reference ``DisaggClusterManager`` / ``WorkerRegistry``
(reference: tensorrt_llm/serve/disagg_auto_scaling.py:59 — etcd-backed
worker registration with TTL leases and watch events driving router
membership). TPU build keeps the same contract with an in-process TTL
store (pluggable for an external KV store later):

  * workers ``register(role, url)`` and then ``heartbeat(worker_id)``
    within ``ttl`` seconds — a missed lease EVICTS the worker and the
    routers drop it (node-leave without a deregister call);
  * watchers (the disagg front door) receive join/leave events and add/
    remove servers on the ctx/gen routers;
  * ``scaling_hint()`` turns aggregate router load into the same
    scale-up / scale-down suggestions the reference's resource governor
    emits (serve/resource_governor.py).
"""
from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, Dict, List, Optional


@dataclasses.dataclass
class WorkerInfo:
    worker_id: str
    role: str                  # "context" | "generation"
    url: str
    registered_at: float
    last_heartbeat: float
    meta: dict = dataclasses.field(default_factory=dict)


class DisaggClusterManager:
    def __init__(self, ttl: float = 30.0, clock=time.monotonic):
        self.ttl = ttl
        self._clock = clock
        self._workers: Dict[str, WorkerInfo] = {}
        self._watchers: List[Callable[[str, WorkerInfo], None]] = []
        self._lock = threading.Lock()
        self._next_id = 0

    # -- membership ----------------------------------------------------- #
    def register(self, role: str, url: str, meta: Optional[dict] = None
                 ) -> str:
        if role not in ("context", "generation"):
            raise ValueError(f"unknown worker role {role!r}")
        with self._lock:
            self._next_id += 1
            wid = f"{role}-{self._next_id}"
            info = WorkerInfo(worker_id=wid, role=role, url=url,
                              registered_at=self._clock(),
                              last_heartbeat=self._clock(),
                              meta=dict(meta or {}))
            self._workers[wid] = info
            watchers = list(self._watchers)
        for w in watchers:
            w("join", info)
        return wid

    def heartbeat(self, worker_id: str, meta: Optional[dict] = None) -> bool:
        with self._lock:
            info = self._workers.get(worker_id)
            if info is None:
                return False         # lease expired: re-register
            info.last_heartbeat = self._clock()
            if meta:
                info.meta.update(meta)
            return True

    def deregister(self, worker_id: str) -> None:
        with self._lock:
            info = self._workers.pop(worker_id, None)
            watchers = list(self._watchers)
        if info is not None:
            for w in watchers:
                w("leave", info)

    def sweep(self) -> List[WorkerInfo]:
        """Evict workers whose lease expired; returns the evicted."""
        now = self._clock()
        with self._lock:
            dead = [w for w in self._workers.values()
                    if now - w.last_heartbeat > self.ttl]
            for w in dead:
                del self._workers[w.worker_id]
            watchers = list(self._watchers)
        for w in dead:
            for cb in watchers:
                cb("leave", w)
        return dead

    def watch(self, callback: Callable[[str, WorkerInfo], None]) -> None:
        """callback(event, info) with event in {"join", "leave"}; replays
        current membership as joins (etcd watch-from-now + initial get)."""
        with self._lock:
            self._watchers.append(callback)
            current = list(self._workers.values())
        for info in current:
            callback("join", info)

    def workers(self, role: Optional[str] = None) -> List[WorkerInfo]:
        with self._lock:
            return [w for w in self._workers.values()
                    if role is None or w.role == role]

    # -- router binding -------------------------------------------------- #
    def bind_routers(self, ctx_router, gen_router, loop=None) -> None:
        """Drive router membership from cluster events (the reference
        binds etcd watch events to router add/remove the same way)."""
        import asyncio

        def on_event(event, info):
            router = ctx_router if info.role == "context" else gen_router
            coro = router.add_server(info.url) if event == "join" \
                else router.remove_server(info.url)
            if loop is not None:
                asyncio.run_coroutine_threadsafe(coro, loop)
            else:
                asyncio.get_event_loop().run_until_complete(coro)
        self.watch(on_event)

    # -- auto-scaling hints ---------------------------------------------- #
    def scaling_hint(self, role: str, active_per_worker: Dict[str, int],
                     high_watermark: int = 8, low_watermark: int = 1
                     ) -> str:
        """"scale_up" when every live worker of ``role`` is above the
        high watermark, "scale_down" when more than one worker sits at/
        below the low watermark, else "steady"."""
        live = self.workers(role)
        if not live:
            return "scale_up"
        loads = [active_per_worker.get(w.url, 0) for w in live]
        if all(ld >= high_watermark for ld in loads):
            return "scale_up"
        if len(live) > 1 and sum(ld <= low_watermark for ld in loads) > 1:
            return "scale_down"
        return "steady"
