"""KV-cache transfer between context and generation engines.

TPU-native analog of the reference ``CacheTransceiver`` stack (reference:
cpp/tensorrt_llm/batch_manager/cacheTransceiver.cpp, dataTransceiver.cpp;
python shim _torch/pyexecutor/kv_cache_transceiver.py:96; transports
UCX/NIXL/MPI/Mooncake under cpp/tensorrt_llm/executor/cache_transmission/).
On TPU the device→device path is host DMA + DCN: the context engine
gathers pages to host (one jitted gather), the transport moves bytes, and
the generation engine scatters them in (one jitted scatter). Transports:

  * InProcessKvTransport — same-process handoff (tests, colocated ctx/gen)
  * TcpKvTransport       — length-prefixed socket stream between hosts
"""
from __future__ import annotations

import socket
import struct
import threading
from typing import Dict, Optional

import msgpack
import numpy as np


def _np_dtype(name: str) -> np.dtype:
    """Resolve a dtype name, including ml_dtypes extensions (bfloat16,
    float8_*) that numpy can't look up by name."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes
        return np.dtype(getattr(ml_dtypes, name))


class KvTransport:
    def put(self, key: str, kv: np.ndarray, meta: dict) -> None:
        raise NotImplementedError

    def get(self, key: str, timeout: float = 60.0) -> tuple:
        raise NotImplementedError

    def release(self, key: str) -> None:
        pass


class InProcessKvTransport(KvTransport):
    _store: Dict[str, tuple] = {}
    _cv = threading.Condition()

    def put(self, key, kv, meta):
        with self._cv:
            self._store[key] = (kv, meta)
            self._cv.notify_all()

    def get(self, key, timeout=60.0):
        with self._cv:
            if not self._cv.wait_for(lambda: key in self._store, timeout):
                raise TimeoutError(f"KV for {key} not received")
            return self._store[key]

    def release(self, key):
        with self._cv:
            self._store.pop(key, None)


class TcpKvTransport(KvTransport):
    """Socket transport for cross-process KV handoff. Two wire ops, both
    msgpack-framed (no pickle crosses the wire — same trust-boundary rule
    as executor_orchestration/broadcast.py):

      * push — peer streams {key, meta, dtype, shape} + raw ndarray bytes
        into this listener's store (ctx engine pushing to a known gen).
      * get  — peer asks this listener for a stored key and the blob is
        streamed back (gen engine PULLING from the ctx server whose
        endpoint rides in ``DisaggregatedParams.opaque_state`` — the
        TPU analog of the reference's requester/responder pull model,
        reference: cpp dataTransceiver.cpp RequestAndReceive).

    The listener binds to ``listen_host`` (default loopback); set it to
    the DCN-facing private interface for cross-host transfer."""

    _MAX_HEADER = 64 << 20      # sanity bound on header size
    _MAX_PAYLOAD = 64 << 30     # sanity bound on KV blob size

    def __init__(self, listen_port: Optional[int] = None,
                 listen_host: str = "127.0.0.1"):
        self._store: Dict[str, tuple] = {}
        self._cv = threading.Condition()
        self._server = None
        self.listen_port = None
        if listen_port is not None:
            self._server = socket.create_server((listen_host, listen_port))
            self.listen_port = self._server.getsockname()[1]
            t = threading.Thread(target=self._serve, daemon=True)
            t.start()

    def _serve(self):
        while True:
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            threading.Thread(target=self._recv_one, args=(conn,),
                             daemon=True).start()

    def _recv_one(self, conn):
        try:
            (hn,) = struct.unpack("<Q", self._read_exact(conn, 8))
            if hn > self._MAX_HEADER:
                raise ValueError(f"header too large: {hn}")
            header = msgpack.unpackb(self._read_exact(conn, hn), raw=False)
            if header.get("op") == "get":
                self._serve_get(conn, header)
                return
            key = header["key"]
            meta = header["meta"]
            dtype = _np_dtype(header["dtype"])
            shape = tuple(header["shape"])
            nbytes = int(dtype.itemsize * np.prod(shape)) if shape else \
                dtype.itemsize
            if nbytes > self._MAX_PAYLOAD:
                raise ValueError(f"payload too large: {nbytes}")
            kv = np.frombuffer(self._read_exact(conn, nbytes),
                               dtype=dtype).reshape(shape)
            with self._cv:
                self._store[key] = (kv, meta)
                self._cv.notify_all()
        finally:
            conn.close()

    def _serve_get(self, conn, header):
        """Stream a stored blob back to a pulling peer, then drop it."""
        key = header["key"]
        timeout = min(float(header.get("timeout", 30.0)), 300.0)
        with self._cv:
            ok = self._cv.wait_for(lambda: key in self._store, timeout)
            item = self._store.pop(key, None) if ok else None
        if item is None:
            resp = msgpack.packb({"status": "missing"}, use_bin_type=True)
            conn.sendall(struct.pack("<Q", len(resp)) + resp)
            return
        kv, meta = item
        kv = np.ascontiguousarray(kv)
        resp = msgpack.packb(
            {"status": "ok", "meta": meta, "dtype": kv.dtype.name,
             "shape": list(kv.shape)}, use_bin_type=True)
        conn.sendall(struct.pack("<Q", len(resp)) + resp)
        conn.sendall(kv.tobytes())

    @staticmethod
    def _read_exact(conn, n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("short read")
            buf += chunk
        return buf

    def send_to(self, host: str, port: int, key: str, kv: np.ndarray,
                meta: dict) -> None:
        kv = np.ascontiguousarray(kv)
        header = msgpack.packb(
            {"key": key, "meta": meta, "dtype": kv.dtype.name,
             "shape": list(kv.shape)}, use_bin_type=True)
        with socket.create_connection((host, port)) as s:
            s.sendall(struct.pack("<Q", len(header)))
            s.sendall(header)
            s.sendall(kv.tobytes())

    def put(self, key, kv, meta):  # local put (ctx side stores for pull)
        with self._cv:
            self._store[key] = (kv, meta)
            self._cv.notify_all()

    def fetch(self, host: str, port: int, key: str,
              timeout: float = 30.0) -> tuple:
        """Pull a blob from a remote listener (gen side)."""
        header = msgpack.packb({"op": "get", "key": key,
                                "timeout": timeout}, use_bin_type=True)
        with socket.create_connection((host, port),
                                      timeout=timeout + 10) as s:
            s.sendall(struct.pack("<Q", len(header)))
            s.sendall(header)
            (hn,) = struct.unpack("<Q", self._read_exact(s, 8))
            if hn > self._MAX_HEADER:
                raise ValueError(f"header too large: {hn}")
            resp = msgpack.unpackb(self._read_exact(s, hn), raw=False)
            if resp.get("status") != "ok":
                raise TimeoutError(f"KV for {key} not available at "
                                   f"{host}:{port}")
            dtype = _np_dtype(resp["dtype"])
            shape = tuple(resp["shape"])
            nbytes = int(dtype.itemsize * np.prod(shape)) if shape else \
                dtype.itemsize
            if nbytes > self._MAX_PAYLOAD:
                raise ValueError(f"payload too large: {nbytes}")
            kv = np.frombuffer(self._read_exact(s, nbytes),
                               dtype=dtype).reshape(shape)
            return kv, resp["meta"]

    def get(self, key, timeout=60.0, endpoint=None):
        if endpoint is not None:
            return self.fetch(endpoint[0], int(endpoint[1]), key, timeout)
        with self._cv:
            if not self._cv.wait_for(lambda: key in self._store, timeout):
                raise TimeoutError(f"KV for {key} not received")
            return self._store[key]

    def release(self, key):
        with self._cv:
            self._store.pop(key, None)

    def close(self):
        if self._server is not None:
            try:
                self._server.close()
            except OSError:
                pass


class KvCacheTransceiver:
    """Engine-facing facade: extract-and-send / receive-and-inject."""

    def __init__(self, engine, kv_manager, transport: KvTransport):
        self.engine = engine
        self.kv_manager = kv_manager
        self.transport = transport

    def send_context_kv(self, request) -> str:
        key = f"ctxkv-{request.request_id}"
        kv = self.engine.extract_kv(request.kv_block_ids,
                                    request.prompt_len)
        meta = {"num_tokens": request.prompt_len,
                "prompt": list(request.prompt_token_ids)}
        self.transport.put(key, np.asarray(kv), meta)
        return key

    def receive_generation_kv(self, request, key: str,
                              timeout: float = 60.0,
                              endpoint=None) -> None:
        try:
            kv, meta = self.transport.get(key, timeout, endpoint=endpoint)
        except TypeError:   # custom transports without pull support
            kv, meta = self.transport.get(key, timeout)
        self.engine.inject_kv(request.kv_block_ids, kv)
        self.transport.release(key)
