"""Disaggregated-serving request parameters.

Mirrors the reference ``DisaggregatedParams`` (reference:
tensorrt_llm/disaggregated_params.py): a context server runs prefill,
returns the first token plus an opaque handle; a generation server pulls
the KV and continues decoding.
"""
from __future__ import annotations

import dataclasses
from typing import List, Literal, Optional


@dataclasses.dataclass
class DisaggregatedParams:
    request_type: Literal["context_only", "generation_only",
                          "context_and_generation"] = "context_and_generation"
    # set by the context phase, consumed by the generation phase:
    ctx_request_id: Optional[int] = None
    first_gen_tokens: Optional[List[int]] = None
    opaque_state: Optional[bytes] = None
