"""Opt-out, fail-silent usage telemetry.

Behavioral reference: tensorrt_llm/usage/usage_lib.py:1 (llm.py:279-296
hook): anonymous init/heartbeat/shutdown events, disabled in CI/test
environments, hard opt-out via env, never raises into the engine, no
redirects followed, bounded payloads. The collector endpoint comes from
``TLLM_TPU_USAGE_SERVER``; without one the reporter is a no-op sink
(events are still recorded in-process for inspection/tests)."""
from __future__ import annotations

import json
import os
import threading
import time
import urllib.request
import uuid
from typing import Any, Dict, List, Optional

from ..logger import logger
from ..version import __version__
from .schema import UsageEvent, validate_event

_OPT_OUT_ENVS = ("TLLM_TPU_USAGE_STATS", "TLLM_USAGE_STATS",
                 "DO_NOT_TRACK")
_CI_ENVS = ("CI", "GITHUB_ACTIONS", "GITLAB_CI", "JENKINS_URL",
            "PYTEST_CURRENT_TEST")


def is_usage_stats_enabled() -> bool:
    if os.environ.get("TLLM_TPU_USAGE_STATS", "").lower() in \
            ("0", "false", "off"):
        return False
    if os.environ.get("TLLM_USAGE_STATS", "").lower() in \
            ("0", "false", "off"):
        return False
    if os.environ.get("DO_NOT_TRACK", "").lower() in ("1", "true"):
        return False
    for e in _CI_ENVS:
        if os.environ.get(e):
            return False
    return True


def _collect_device_info() -> Dict[str, Any]:
    try:
        import jax
        devs = jax.devices()
        return {"platform": jax.default_backend(),
                "device_kind": devs[0].device_kind if devs else "",
                "num_devices": len(devs)}
    except Exception:
        return {"platform": "unknown", "device_kind": "", "num_devices": 0}


def collect_features(llm_args: Any) -> str:
    """Comma-joined enabled-feature names (sanitized flags only;
    reference: _collect_features)."""
    feats: List[str] = []
    try:
        if getattr(llm_args, "speculative_config", None):
            feats.append("spec:" + llm_args.speculative_config.mode)
        if getattr(llm_args, "enable_lora", False):
            feats.append("lora")
        if getattr(llm_args, "guided_decoding_backend", None):
            feats.append("guided")
        if getattr(llm_args, "kv_connector_config", None):
            feats.append("kv_connector")
        if getattr(llm_args, "cache_transceiver_config", None):
            feats.append("disagg")
        if getattr(llm_args, "enable_chunked_prefill", False):
            feats.append("chunked_prefill")
        if not getattr(llm_args, "disable_overlap_scheduler", False):
            feats.append("overlap")
        if getattr(llm_args, "decode_multi_step", 1) > 1:
            feats.append("multi_step")
        q = getattr(getattr(llm_args, "quant_config", None), "quant_algo",
                    None)
        if q:
            feats.append("quant:" + str(q))
    except Exception:
        pass
    return ",".join(feats)


class UsageReporter:
    """Background, fail-silent event reporter (reference:
    _background_reporter thread + heartbeats)."""

    def __init__(self, server: Optional[str] = None,
                 heartbeat_interval: float = 3600.0):
        self.server = server if server is not None else \
            os.environ.get("TLLM_TPU_USAGE_SERVER", "")
        self.heartbeat_interval = heartbeat_interval
        self.session_id = uuid.uuid4().hex
        self.recorded: List[Dict[str, Any]] = []   # in-process sink
        self._start = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._stats_fn = None

    # -- event assembly --------------------------------------------------
    def _base_event(self, event_type: str, llm=None) -> UsageEvent:
        dev = _collect_device_info()
        ev = UsageEvent(event_type=event_type,
                        session_id=self.session_id,
                        version=__version__, backend="jax", **dev)
        if llm is not None:
            try:
                a = llm.args
                ev.architecture = type(llm.model).__name__
                ev.dtype = str(a.dtype)
                ev.quant_algo = str(a.quant_config.quant_algo or "")
                ev.max_batch_size = a.max_batch_size
                ev.max_seq_len = a.max_seq_len or 0
                ev.tp_size = a.tensor_parallel_size
                ev.pp_size = a.pipeline_parallel_size
                ev.cp_size = a.context_parallel_size
                ev.dp_size = a.data_parallel_size
                ev.features = collect_features(a)
            except Exception:
                pass
        ev.uptime_s = time.monotonic() - self._start
        if self._stats_fn is not None:
            try:
                n_req, n_tok = self._stats_fn()
                ev.num_requests, ev.num_tokens_out = n_req, n_tok
            except Exception:
                pass
        return ev

    def _emit(self, ev: UsageEvent) -> None:
        try:
            payload = ev.to_payload()
            validate_event(payload)
            self.recorded.append(payload)
            if self.server:
                req = urllib.request.Request(
                    self.server, data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"})
                # no-redirect opener: a redirecting collector must not
                # re-route telemetry elsewhere (reference:
                # _NoRedirectHandler)
                opener = urllib.request.build_opener(_NoRedirect())
                opener.open(req, timeout=5).close()
        except Exception as e:          # MUST never surface
            logger.debug("usage report dropped: %s", e)

    # -- lifecycle -------------------------------------------------------
    def start(self, llm=None, stats_fn=None) -> None:
        if not is_usage_stats_enabled():
            return
        self._stats_fn = stats_fn
        self._emit(self._base_event("llm_init", llm))

        def beat():
            while not self._stop.wait(self.heartbeat_interval):
                self._emit(self._base_event("heartbeat", llm))
        self._thread = threading.Thread(target=beat, daemon=True)
        self._thread.start()

    def shutdown(self, llm=None) -> None:
        if self._thread is None:
            return
        self._stop.set()
        self._emit(self._base_event("llm_shutdown", llm))


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None
