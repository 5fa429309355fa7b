"""OpenAI-compatible protocol models.

Field coverage mirrors the reference (reference:
tensorrt_llm/serve/openai_protocol.py:1-1527 — CompletionRequest,
ChatCompletionRequest, responses). Pydantic v2.
"""
from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, Field

from ..sampling_params import GuidedDecodingParams, SamplingParams


def random_uuid(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex}"


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "tensorrt_llm_tpu"


class ModelList(BaseModel):
    object: str = "list"
    data: List[ModelCard] = Field(default_factory=list)


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


class StreamOptions(BaseModel):
    include_usage: bool = False
    continuous_usage_stats: bool = False


class ResponseFormat(BaseModel):
    type: Literal["text", "json_object", "json_schema"] = "text"
    json_schema: Optional[Dict[str, Any]] = None


class DisaggregatedParamsPayload(BaseModel):
    """JSON carrier for DisaggregatedParams over HTTP (reference:
    openai_protocol.py DisaggregatedParams / to_llm_disaggregated_params).
    ``opaque_state`` is base64 so the ctx engine's KV pull endpoint can
    ride through the router untouched."""
    request_type: Literal["context_only", "generation_only",
                          "context_and_generation"] = \
        "context_and_generation"
    ctx_request_id: Optional[int] = None
    first_gen_tokens: Optional[List[int]] = None
    opaque_state: Optional[str] = None       # base64

    def to_params(self):
        import base64
        from ..disaggregation import DisaggregatedParams
        return DisaggregatedParams(
            request_type=self.request_type,
            ctx_request_id=self.ctx_request_id,
            first_gen_tokens=self.first_gen_tokens,
            opaque_state=(base64.b64decode(self.opaque_state)
                          if self.opaque_state else None))

    @classmethod
    def from_params(cls, p) -> "DisaggregatedParamsPayload":
        import base64
        return cls(
            request_type=p.request_type,
            ctx_request_id=p.ctx_request_id,
            first_gen_tokens=p.first_gen_tokens,
            opaque_state=(base64.b64encode(p.opaque_state).decode()
                          if p.opaque_state else None))


class CompletionRequest(BaseModel):
    model: str
    prompt: Union[str, List[str], List[int], List[List[int]]]
    best_of: Optional[int] = None
    echo: bool = False
    frequency_penalty: float = 0.0
    logit_bias: Optional[Dict[str, float]] = None
    logprobs: Optional[int] = None
    max_tokens: int = 16
    n: int = 1
    presence_penalty: float = 0.0
    seed: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    suffix: Optional[str] = None
    temperature: float = 1.0
    top_p: float = 1.0
    user: Optional[str] = None
    # extensions (reference: CompletionRequest extra fields)
    top_k: int = 0
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    min_tokens: int = 0
    ignore_eos: bool = False
    stop_token_ids: Optional[List[int]] = None
    skip_special_tokens: bool = True
    detokenize: bool = True
    response_format: Optional[ResponseFormat] = None
    disaggregated_params: Optional[DisaggregatedParamsPayload] = None

    def to_sampling_params(self) -> SamplingParams:
        guided = None
        if self.response_format and self.response_format.type == "json_object":
            guided = GuidedDecodingParams(json_object=True)
        elif self.response_format and self.response_format.type == "json_schema":
            guided = GuidedDecodingParams(json=self.response_format.json_schema)
        return SamplingParams(
            max_tokens=self.max_tokens, min_tokens=self.min_tokens,
            temperature=self.temperature, top_p=self.top_p, top_k=self.top_k,
            min_p=self.min_p, n=self.n, best_of=self.best_of,
            seed=self.seed, stop=self.stop, stop_token_ids=self.stop_token_ids,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            ignore_eos=self.ignore_eos, logprobs=self.logprobs,
            skip_special_tokens=self.skip_special_tokens,
            detokenize=self.detokenize, guided_decoding=guided)


class CompletionResponseChoice(BaseModel):
    index: int
    text: str
    token_ids: Optional[List[int]] = None
    logprobs: Optional[Any] = None
    finish_reason: Optional[str] = None
    disaggregated_params: Optional[DisaggregatedParamsPayload] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: random_uuid("cmpl"))
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[CompletionResponseChoice]
    usage: UsageInfo = Field(default_factory=UsageInfo)


class ChatMessage(BaseModel):
    role: str
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    # harmony analysis channel (GPT-OSS; reference: harmony_adapter.py)
    reasoning_content: Optional[str] = None
    name: Optional[str] = None
    tool_calls: Optional[List[Dict[str, Any]]] = None
    tool_call_id: Optional[str] = None


class ChatCompletionRequest(BaseModel):
    model: str
    messages: List[ChatMessage]
    frequency_penalty: float = 0.0
    logit_bias: Optional[Dict[str, float]] = None
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    n: int = 1
    presence_penalty: float = 0.0
    response_format: Optional[ResponseFormat] = None
    seed: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    temperature: float = 1.0
    top_p: float = 1.0
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Optional[Union[str, Dict[str, Any]]] = None
    user: Optional[str] = None
    # extensions
    top_k: int = 0
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    min_tokens: int = 0
    ignore_eos: bool = False
    stop_token_ids: Optional[List[int]] = None
    skip_special_tokens: bool = True
    add_generation_prompt: bool = True
    chat_template: Optional[str] = None
    chat_template_kwargs: Optional[Dict[str, Any]] = None
    disaggregated_params: Optional[DisaggregatedParamsPayload] = None

    def to_sampling_params(self) -> SamplingParams:
        max_toks = self.max_completion_tokens or self.max_tokens or 512
        guided = None
        if self.response_format and self.response_format.type == "json_object":
            guided = GuidedDecodingParams(json_object=True)
        elif self.response_format and self.response_format.type == "json_schema":
            guided = GuidedDecodingParams(json=self.response_format.json_schema)
        return SamplingParams(
            max_tokens=max_toks, min_tokens=self.min_tokens,
            temperature=self.temperature, top_p=self.top_p, top_k=self.top_k,
            min_p=self.min_p, n=self.n, seed=self.seed, stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            ignore_eos=self.ignore_eos,
            logprobs=self.top_logprobs if self.logprobs else None,
            skip_special_tokens=self.skip_special_tokens,
            guided_decoding=guided)


class ChatCompletionResponseChoice(BaseModel):
    index: int
    message: ChatMessage
    logprobs: Optional[Any] = None
    finish_reason: Optional[str] = None
    disaggregated_params: Optional[DisaggregatedParamsPayload] = None


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: random_uuid("chatcmpl"))
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[ChatCompletionResponseChoice]
    usage: UsageInfo = Field(default_factory=UsageInfo)


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None


class ChatCompletionStreamChoice(BaseModel):
    index: int
    delta: DeltaMessage
    finish_reason: Optional[str] = None


class ChatCompletionStreamResponse(BaseModel):
    id: str = Field(default_factory=lambda: random_uuid("chatcmpl"))
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[ChatCompletionStreamChoice]
    usage: Optional[UsageInfo] = None


class ErrorResponse(BaseModel):
    object: str = "error"
    message: str
    type: str = "invalid_request_error"
    code: int = 400
