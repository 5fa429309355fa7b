"""Multi-process worker group: spawn + liveness monitoring.

Role analog of the reference's proxy/worker process model
(reference: tensorrt_llm/llmapi/mpi_session.py MpiPoolSession,
executor/proxy.py:409 mpi_session.submit(worker_main) + the liveness
monitor at proxy.py:430-503). TPU shape: workers are plain OS
processes launched with the ``tllm-tpu-launch`` CLI
(commands/launch.py); the leader runs in THIS process and followers
connect back over the RequestBroadcaster TCP sockets. Death handling
is two-layer: the socket layer flags dead followers
(RequestBroadcaster.dead_followers / ``__follower_dead__`` markers →
per-request errors in the dp leader), and this monitor reaps the OS
process and exposes exit codes.
"""
from __future__ import annotations

import os
import subprocess
import sys
import threading
import time
from typing import Callable, Dict, List, Optional

from ..logger import logger


class WorkerHandle:
    """One spawned follower process."""

    def __init__(self, proc: subprocess.Popen, rank: int):
        self.proc = proc
        self.rank = rank
        self.exit_code: Optional[int] = None

    @property
    def alive(self) -> bool:
        return self.proc.poll() is None

    def terminate(self, timeout: float = 10.0) -> None:
        if self.alive:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                self.proc.kill()
        self.exit_code = self.proc.poll()


class MultiProcessSession:
    """Spawn follower worker processes and monitor their liveness.

    ``spawn(n)`` launches ``tllm-tpu-launch`` workers configured via
    env/args; ``on_death(cb)`` registers a callback invoked with the
    worker handle when a process exits unexpectedly. The leader LLM is
    built in the CURRENT process with ``orchestrator_config`` —
    followers dial back over TCP (single-controller per host; the
    multi-host analog of the reference's MPI_Comm_spawn worker model,
    executor_worker/executorWorker.cpp:27)."""

    def __init__(self, model_ref: str, port: int, role_base: str = "dp",
                 extra_args: Optional[Dict[str, str]] = None,
                 python: Optional[str] = None):
        self.model_ref = model_ref
        self.port = port
        self.role_base = role_base     # "dp" -> dp_follower; "" -> follower
        self.extra_args = extra_args or {}
        self.python = python or sys.executable
        self.workers: List[WorkerHandle] = []
        self._death_cbs: List[Callable[[WorkerHandle], None]] = []
        self._monitor: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def spawn(self, num_followers: int) -> List[WorkerHandle]:
        role = ("dp_follower" if self.role_base == "dp" else "follower")
        for i in range(num_followers):
            rank = i + 1
            cmd = [self.python, "-m",
                   "tensorrt_llm_tpu.commands.launch",
                   "--role", role, "--port", str(self.port),
                   "--dp-rank", str(rank),
                   "--model", self.model_ref]
            for k, v in self.extra_args.items():
                cmd += [f"--{k}", str(v)]
            proc = subprocess.Popen(cmd, env=dict(os.environ))
            self.workers.append(WorkerHandle(proc, rank))
            logger.info("spawned %s rank %d (pid %d)", role, rank,
                        proc.pid)
        self._monitor = threading.Thread(target=self._watch, daemon=True,
                                         name="tllm-worker-monitor")
        self._monitor.start()
        return self.workers

    def on_death(self, cb: Callable[[WorkerHandle], None]) -> None:
        self._death_cbs.append(cb)

    def _watch(self) -> None:
        reported = set()
        while not self._stop.is_set():
            for w in self.workers:
                if w.rank in reported:
                    continue
                rc = w.proc.poll()
                if rc is not None:
                    w.exit_code = rc
                    reported.add(w.rank)
                    if not self._stop.is_set():
                        logger.error("worker rank %d exited rc=%s",
                                     w.rank, rc)
                        for cb in self._death_cbs:
                            try:
                                cb(w)
                            except Exception:  # pragma: no cover
                                pass
            self._stop.wait(0.5)

    def shutdown(self) -> None:
        self._stop.set()
        for w in self.workers:
            w.terminate()
        if self._monitor is not None:
            self._monitor.join(timeout=5)
