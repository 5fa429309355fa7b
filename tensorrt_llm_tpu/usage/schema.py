"""Usage-event schema + validation.

Behavioral reference: tensorrt_llm/usage/schema.py:1 and
schemas/trtllm_usage_event_schema.json — a versioned, sanitized,
strictly-bounded event: no prompts, no paths, no user data; only
architecture class names, engine shape, feature flags and coarse
device info."""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

SCHEMA_VERSION = 1

_MAX_STR = 128

USAGE_EVENT_SCHEMA: Dict[str, Any] = {
    "type": "object",
    "additionalProperties": False,
    "required": ["schema_version", "event_type", "session_id",
                 "timestamp", "version"],
    "properties": {
        "schema_version": {"type": "integer"},
        "event_type": {"enum": ["llm_init", "heartbeat", "llm_shutdown"]},
        "session_id": {"type": "string", "maxLength": 64},
        "timestamp": {"type": "number"},
        "version": {"type": "string", "maxLength": _MAX_STR},
        "backend": {"type": "string", "maxLength": _MAX_STR},
        "platform": {"type": "string", "maxLength": _MAX_STR},
        "device_kind": {"type": "string", "maxLength": _MAX_STR},
        "num_devices": {"type": "integer"},
        "architecture": {"type": "string", "maxLength": _MAX_STR},
        "dtype": {"type": "string", "maxLength": 32},
        "quant_algo": {"type": "string", "maxLength": 64},
        "max_batch_size": {"type": "integer"},
        "max_seq_len": {"type": "integer"},
        "tp_size": {"type": "integer"},
        "pp_size": {"type": "integer"},
        "cp_size": {"type": "integer"},
        "dp_size": {"type": "integer"},
        "features": {"type": "string", "maxLength": 512},
        "uptime_s": {"type": "number"},
        "num_requests": {"type": "integer"},
        "num_tokens_out": {"type": "integer"},
    },
}


def _clamp(v: str, n: int = _MAX_STR) -> str:
    return str(v)[:n]


@dataclasses.dataclass
class UsageEvent:
    event_type: str
    session_id: str
    version: str
    backend: str = ""
    platform: str = ""
    device_kind: str = ""
    num_devices: int = 0
    architecture: str = ""
    dtype: str = ""
    quant_algo: str = ""
    max_batch_size: int = 0
    max_seq_len: int = 0
    tp_size: int = 1
    pp_size: int = 1
    cp_size: int = 1
    dp_size: int = 1
    features: str = ""
    uptime_s: float = 0.0
    num_requests: int = 0
    num_tokens_out: int = 0
    timestamp: float = dataclasses.field(default_factory=time.time)
    schema_version: int = SCHEMA_VERSION

    def to_payload(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        for k in ("version", "backend", "platform", "device_kind",
                  "architecture", "dtype", "quant_algo"):
            d[k] = _clamp(d[k])
        d["features"] = _clamp(d["features"], 512)
        d["session_id"] = _clamp(d["session_id"], 64)
        return d


def validate_event(payload: Dict[str, Any]) -> None:
    """Schema check without a jsonschema dependency: required keys,
    closed key set, type + bound enforcement."""
    props = USAGE_EVENT_SCHEMA["properties"]
    for k in USAGE_EVENT_SCHEMA["required"]:
        if k not in payload:
            raise ValueError(f"missing required field {k}")
    for k, v in payload.items():
        if k not in props:
            raise ValueError(f"unknown field {k}")
        spec = props[k]
        if "enum" in spec:
            if v not in spec["enum"]:
                raise ValueError(f"{k}={v!r} not in {spec['enum']}")
        elif spec["type"] == "string":
            if not isinstance(v, str) or len(v) > spec.get(
                    "maxLength", 1 << 30):
                raise ValueError(f"{k} invalid string")
        elif spec["type"] == "integer":
            if not isinstance(v, int):
                raise ValueError(f"{k} must be int")
        elif spec["type"] == "number":
            if not isinstance(v, (int, float)):
                raise ValueError(f"{k} must be number")
