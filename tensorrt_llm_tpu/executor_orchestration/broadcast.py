"""Multi-host request/schedule broadcast.

Role of the reference's cross-rank intake (reference:
tensorrt_llm/_torch/pyexecutor/executor_request_queue.py:42 — rank 0
dequeues and broadcasts to other ranks; request_utils.RequestBroadcaster;
SerializableSchedulerOutput scheduler/scheduler.py:160).

On TPU pods the data plane is a single GSPMD program, but each *host*
runs its own python process that must issue identical jit calls each
iteration. The leader (host 0) makes every scheduling decision and
broadcasts a compact, deterministic description of the batch; followers
replay it. Transport: length-prefixed TCP fan-out (DCN); the payload is
msgpack-serialized (no pickle across trust boundaries).
"""
from __future__ import annotations

import dataclasses
import queue
import socket
import struct
import threading
from typing import Dict, List, Optional

import msgpack

from ..runtime.request import LlmRequest
from ..runtime.scheduler import ScheduledRequests
from ..sampling_params import SamplingParams


_SP_FIELDS = ("max_tokens", "min_tokens", "top_k", "top_p", "min_p",
              "temperature", "end_id", "seed", "ignore_eos",
              "repetition_penalty", "presence_penalty",
              "frequency_penalty", "stop_token_ids")


@dataclasses.dataclass
class SerializableBatch:
    """Deterministic description of one scheduled iteration.

    ``finished_ids``: requests the leader completed for reasons a
    follower cannot derive from the token stream alone (cancellation);
    eos/length finishes are data-deterministic and replayed locally.
    ``shutdown`` ends the follower loop."""
    iter_id: int
    # new requests entering this iteration: full definition
    new_requests: List[dict]
    # per-request scheduling decisions, by request_id
    context_chunks: Dict[int, int]
    scheduled_ctx_ids: List[int]
    scheduled_gen_ids: List[int]
    draft_tokens: Dict[int, List[int]]
    paused_ids: List[int] = dataclasses.field(default_factory=list)
    finished_ids: List[int] = dataclasses.field(default_factory=list)
    shutdown: bool = False
    # mixed-window carve plan: context requests riding INSIDE the decode
    # window this iteration, in carve order (the follower replays the
    # plan verbatim so leader/follower stay bit-identical)
    rider_ids: List[int] = dataclasses.field(default_factory=list)

    def pack(self) -> bytes:
        return msgpack.packb(dataclasses.asdict(self), use_bin_type=True)

    @classmethod
    def unpack(cls, raw: bytes) -> "SerializableBatch":
        d = msgpack.unpackb(raw, raw=False, strict_map_key=False)
        return cls(**d)

    @classmethod
    def from_schedule(cls, iter_id: int, batch: ScheduledRequests,
                      new_requests: List[LlmRequest],
                      paused_ids: Optional[List[int]] = None,
                      finished_ids: Optional[List[int]] = None
                      ) -> "SerializableBatch":
        def req_dict(r: LlmRequest) -> dict:
            sp = r.sampling_params
            d = {f: getattr(sp, f) for f in _SP_FIELDS}
            d["stop_token_ids"] = list(d["stop_token_ids"] or [])
            d["request_id"] = r.request_id
            d["prompt_token_ids"] = list(r.prompt_token_ids)
            d["cache_salt"] = r.cache_salt
            d["dp_rank"] = r.dp_rank
            d["streaming"] = r.streaming
            return d
        return cls(
            iter_id=iter_id,
            new_requests=[req_dict(r) for r in new_requests],
            context_chunks={r.request_id: r.context_chunk_size
                            for r in batch.context_requests},
            scheduled_ctx_ids=[r.request_id
                               for r in batch.context_requests],
            scheduled_gen_ids=[r.request_id
                               for r in batch.generation_requests],
            draft_tokens={r.request_id: list(r.draft_tokens)
                          for r in batch.generation_requests
                          if r.draft_tokens},
            paused_ids=list(paused_ids or []),
            finished_ids=list(finished_ids or []))

    def materialize_new_requests(self) -> List[LlmRequest]:
        out = []
        for d in self.new_requests:
            sp = SamplingParams(**{f: d[f] for f in _SP_FIELDS})
            req = LlmRequest(prompt_token_ids=d["prompt_token_ids"],
                             sampling_params=sp,
                             request_id=d["request_id"],
                             cache_salt=d["cache_salt"],
                             streaming=bool(d.get("streaming", False)))
            req.dp_rank = d.get("dp_rank")
            out.append(req)
        return out


class RequestBroadcaster:
    """Leader: ``serve(followers)`` then ``broadcast(batch)``.
    Follower: ``connect(leader)`` then ``recv()`` per iteration."""

    def __init__(self, rank: int = 0):
        self.rank = rank
        self._conns: List[socket.socket] = []
        self._sock: Optional[socket.socket] = None
        self._lock = threading.Lock()
        # liveness (reference: executor/proxy.py:430-503 worker
        # monitoring): indices of followers whose sockets died; the
        # leader consumes these instead of hanging/crashing on sendall
        self.dead_followers: List[int] = []
        self._conn_alive: List[bool] = []

    # leader ----------------------------------------------------------- #
    def serve(self, port: int, num_followers: int) -> None:
        srv = socket.create_server(("0.0.0.0", port))
        for _ in range(num_followers):
            conn, _ = srv.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._conns.append(conn)
            self._conn_alive.append(True)
        srv.close()

    def broadcast(self, batch: SerializableBatch) -> None:
        payload = batch.pack()
        header = struct.pack("<Q", len(payload))
        with self._lock:
            for i, c in enumerate(self._conns):
                if not self._conn_alive[i]:
                    continue
                try:
                    c.sendall(header)
                    c.sendall(payload)
                except OSError:
                    # dead follower: drop the connection, record the
                    # death, keep the loop alive for everyone else
                    self._mark_dead(i)

    def _mark_dead(self, i: int) -> None:
        if self._conn_alive[i]:
            self._conn_alive[i] = False
            self.dead_followers.append(i)
            try:
                self._conns[i].close()
            except OSError:
                pass
            if hasattr(self, "_results_q"):
                self._results_q.put({"type": "__follower_dead__",
                                     "conn_index": i})

    @property
    def num_alive(self) -> int:
        return sum(self._conn_alive)

    # follower --------------------------------------------------------- #
    def connect(self, host: str, port: int, timeout: float = 120.0) -> None:
        """Dial the leader, retrying until ``timeout`` — follower
        processes routinely come up before the leader finishes its
        engine build and binds (reference: MGMN workers poll the
        rank-0 endpoint the same way)."""
        import time as _time
        deadline = _time.monotonic() + timeout
        while True:
            try:
                self._sock = socket.create_connection((host, port),
                                                      timeout=10.0)
                break
            except OSError:
                if _time.monotonic() >= deadline:
                    raise
                _time.sleep(0.5)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def recv(self) -> SerializableBatch:
        raw = self._read_exact(8)
        (n,) = struct.unpack("<Q", raw)
        return SerializableBatch.unpack(self._read_exact(n))

    def recv_timeout(self, timeout: float) -> Optional[SerializableBatch]:
        """Non-blocking-ish recv: None if no frame starts within
        ``timeout`` (once a header byte arrives, blocks for the rest)."""
        self._sock.settimeout(timeout)
        try:
            first = self._sock.recv(1)
        except socket.timeout:
            return None
        finally:
            self._sock.settimeout(None)
        if not first:
            raise ConnectionError("leader closed")
        raw = first + self._read_exact(7)
        (n,) = struct.unpack("<Q", raw)
        return SerializableBatch.unpack(self._read_exact(n))

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("leader closed")
            buf += chunk
        return buf

    # dp-group return channel (attention-DP across processes: each rank
    # executes its own request partition and streams results back to the
    # leader on the same full-duplex socket) -------------------------- #
    def start_result_reader(self) -> None:
        """Leader: spawn one reader thread per follower connection;
        messages drain via ``poll_results``. A closed/broken socket
        emits a ``__follower_dead__`` marker so the consumer can fail
        the dead rank's requests instead of waiting forever."""
        self._results_q: "queue.Queue" = queue.Queue()

        def reader(conn, idx):
            def read_exact(n):
                buf = b""
                while len(buf) < n:
                    chunk = conn.recv(n - len(buf))
                    if not chunk:
                        raise ConnectionError("follower closed")
                    buf += chunk
                return buf
            try:
                while True:
                    (n,) = struct.unpack("<Q", read_exact(8))
                    msg = msgpack.unpackb(read_exact(n), raw=False,
                                          strict_map_key=False)
                    msg["__conn_index__"] = idx
                    self._results_q.put(msg)
            except (ConnectionError, OSError):
                with self._lock:
                    self._mark_dead(idx)
                return

        for i, c in enumerate(self._conns):
            threading.Thread(target=reader, args=(c, i), daemon=True,
                             name="tllm-dp-results").start()

    def poll_results(self) -> List[dict]:
        out = []
        if not hasattr(self, "_results_q"):
            return out
        while True:
            try:
                out.append(self._results_q.get_nowait())
            except queue.Empty:
                return out

    def send_result(self, payload: dict) -> None:
        """Follower: ship one result/heartbeat message to the leader."""
        raw = msgpack.packb(payload, use_bin_type=True)
        with self._lock:
            self._sock.sendall(struct.pack("<Q", len(raw)))
            self._sock.sendall(raw)

    def close(self) -> None:
        for c in self._conns:
            c.close()
        if self._sock:
            self._sock.close()
