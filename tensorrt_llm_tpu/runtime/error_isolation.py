"""Per-request error isolation and the executor error budget.

Role analog of the reference's fatal-error detection
(reference: tensorrt_llm/_torch/pyexecutor/error_classification.py:44,72
— classify_error + token-bucket ErrorBudget) and the staged OOM
explanation at engine creation (py_executor_creator.py:116). Re-designed
for the TPU runtime: the unrecoverable class is a poisoned XLA client /
device tunnel rather than a corrupted CUDA context, and the recoverable
class covers host-side per-request work (grammar compilation, logits
processors, stop-string postproc) where a single poison request must not
take down the serving loop.

Dependency-free so it can be unit-tested anywhere.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

# The XLA client (or the device tunnel) is gone: no future dispatch can
# succeed, so recovery is impossible regardless of budget.
IMMEDIATE_FATAL_PATTERNS = (
    "device or resource busy",
    "xla runtime error",
    "internal: accelerator",
    "tpu is already in use",
    "data loss:",
    "deadline exceeded",
    "failed to connect",
    "socket closed",
)

# Serious but possibly transient (a single allocation spike under load);
# these drain the budget 5x faster than transient errors.
SEVERE_ERROR_PATTERNS = (
    "resource_exhausted",
    "resource exhausted",
    "out of memory",
    r"\boom\b",
    "allocation failure",
)


def classify_error(error_msg: str) -> str:
    """Classify an error message: immediate_fatal | severe | transient."""
    import re
    low = error_msg.lower()
    for p in IMMEDIATE_FATAL_PATTERNS:
        if p in low:
            return "immediate_fatal"
    for p in SEVERE_ERROR_PATTERNS:
        if re.search(p, low) if "\\b" in p else p in low:
            return "severe"
    return "transient"


class RequestError(Exception):
    """An error attributable to exactly one request.

    Raised from per-request host work inside the executor loop (grammar
    compile, logits processor, postproc). The loop fails only the
    culprit request and keeps serving the rest of the batch.
    """

    def __init__(self, request, stage: str, cause: Exception):
        super().__init__(f"request {getattr(request, 'request_id', '?')} "
                         f"failed at {stage}: {cause!r}")
        self.request = request
        self.stage = stage
        self.cause = cause


@dataclasses.dataclass
class ErrorBudget:
    """Token-bucket budget deciding when loop errors become fatal.

    Each recoverable error deducts ``cost`` (severe errors cost 5x);
    the budget refills at ``recovery_rate``/s of error-free time. When
    the bucket empties, the next error is promoted to fatal. Immediate-
    fatal classes bypass the bucket.
    """

    budget: float = 1.0
    recovery_rate: float = 0.1
    cost: float = 0.1
    last_error_time: Optional[float] = None

    def consume(self, error_msg: str, now: Optional[float] = None) -> bool:
        """Record one error. Returns True if it must be treated FATAL."""
        severity = classify_error(error_msg)
        if severity == "immediate_fatal":
            return True
        now = time.monotonic() if now is None else now
        if self.last_error_time is not None:
            self.budget = min(
                1.0, self.budget + (now - self.last_error_time)
                * self.recovery_rate)
        self.last_error_time = now
        self.budget -= self.cost * (5.0 if severity == "severe" else 1.0)
        return self.budget < 0.0


# Stage-tagged OOM explanation (reference: py_executor_creator.py:116
# _adjust_torch_mem_fraction / creation-stage OOM messages). The engine
# bring-up path tags its stages so an allocation failure names the knob
# that relieves it.
_STAGE_HINTS = {
    "weights": ("loading model weights",
                "use a quantized checkpoint (quant_config) or shard over "
                "more chips (tensor_parallel_size)"),
    "kv_pool": ("allocating the paged KV-cache pools",
                "lower kv_cache_config.free_gpu_memory_fraction or "
                "max_seq_len/max_batch_size"),
    "warmup": ("compiling + warming the step programs",
               "lower max_num_tokens (largest token bucket) or "
               "decode_multi_step"),
    "forward": ("running a forward step",
                "lower max_batch_size or max_num_tokens"),
}


def explain_stage_oom(stage: str, exc: Exception) -> str:
    what, hint = _STAGE_HINTS.get(stage, (stage, "reduce memory knobs"))
    return (f"out of device memory while {what}: {exc}. Try: {hint}.")
