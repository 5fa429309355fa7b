"""Configuration tree for the LLM API.

Pydantic models with the semantics of the reference config system
(reference: tensorrt_llm/llmapi/llm_args.py — BaseLlmArgs:2878,
TorchLlmArgs:3762, KvCacheConfig:2524, SchedulerConfig:2320; field
checklists SURVEY.md §A.2-A.4). One tree, YAML-overlayable; no C++ mirror
layer is needed on TPU (the XLA runtime has no separate config object).
"""
from __future__ import annotations

from enum import Enum
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, Field, field_validator, model_validator

from ..quantization.mode import KvCacheQuantAlgo, QuantAlgo
from ..runtime.scheduler import CapacitySchedulerPolicy, ContextChunkingPolicy


class StrictBaseModel(BaseModel):
    """Rejects unknown keys, like the reference (llm.py:200-208)."""
    model_config = dict(extra="forbid", validate_assignment=True,
                        arbitrary_types_allowed=True)


class KvCacheConfig(StrictBaseModel):
    """Reference: llm_args.py:2524-2651 (§A.4)."""
    enable_block_reuse: bool = True
    max_tokens: Optional[int] = None
    max_attention_window: Optional[List[int]] = None
    sink_token_length: int = 0
    free_gpu_memory_fraction: float = Field(0.9, gt=0.0, le=1.0)
    host_cache_size: Optional[int] = None
    # tertiary KV tier: host-LRU victims demote to disk (reference:
    # kv_cache_manager_v2 multi-tier storage); None = two tiers only
    disk_cache_dir: Optional[str] = None
    disk_cache_size: Optional[int] = None   # bytes
    enable_partial_reuse: bool = False
    copy_on_partial_reuse: bool = True
    event_buffer_max_size: int = 0
    dtype: str = "auto"          # auto|bf16|fp8|int8
    tokens_per_block: int = 32   # TPU page size; must divide 8-lane tiling
    secondary_offload_min_priority: Optional[int] = None
    max_util_for_resume: float = 0.95

    @field_validator("tokens_per_block")
    @classmethod
    def _power_of_two(cls, v: int) -> int:
        if v & (v - 1) or v <= 0:
            raise ValueError("tokens_per_block must be a power of 2")
        return v


class SchedulerConfig(StrictBaseModel):
    """Reference: llm_args.py:2320 (+ scheduler-v2 waiting queue,
    waiting_queue.py)."""
    capacity_scheduler_policy: CapacitySchedulerPolicy = \
        CapacitySchedulerPolicy.GUARANTEED_NO_EVICT
    context_chunking_policy: ContextChunkingPolicy = \
        ContextChunkingPolicy.FIRST_COME_FIRST_SERVED
    dynamic_batch_config: Optional[dict] = None
    # scheduler-v2 admission stage: requests wait here (ordered by
    # policy) until the active set has room
    waiting_queue_policy: Literal["fcfs", "priority"] = "fcfs"
    # cap on requests concurrently holding executor state; None = 4x
    # max_batch_size (waiting requests hold no KV/slots)
    max_active_requests: Optional[int] = None


class BucketingConfig(StrictBaseModel):
    """XLA compile-bucket control — the CUDA-graph-config analog
    (reference: CudaGraphConfig llm_args.py:109; padding gain up to +22%
    e2e, docs/source/developer-guide/overview.md:55). Batches are padded up
    to the nearest bucket so every iteration hits a cached XLA executable."""
    batch_sizes: Optional[List[int]] = None      # decode batch buckets
    token_buckets: Optional[List[int]] = None    # flattened-token buckets
    enable_padding: bool = True
    max_bucket_batch_size: int = 256

    def resolve_batch_sizes(self, max_batch_size: int) -> List[int]:
        if self.batch_sizes:
            return sorted(set(min(b, max_batch_size) for b in self.batch_sizes))
        sizes, b = [], 1
        while b < min(self.max_bucket_batch_size, max_batch_size):
            sizes.append(b)
            b *= 2
        sizes.append(min(self.max_bucket_batch_size, max_batch_size))
        return sorted(set(sizes))

    def resolve_token_buckets(self, max_num_tokens: int) -> List[int]:
        if self.token_buckets:
            return sorted(set(min(t, max_num_tokens) for t in self.token_buckets))
        # powers of 4: each bucket is a full XLA compile (minutes on big
        # models), so favor fewer buckets over tighter padding
        buckets, t = [], 64
        while t < max_num_tokens:
            buckets.append(t)
            t *= 4
        buckets.append(max_num_tokens)
        return sorted(set(buckets))


class QuantConfig(StrictBaseModel):
    """Reference: tensorrt_llm/quantization (QuantConfig) + mode.py."""
    quant_algo: QuantAlgo = QuantAlgo.NO_QUANT
    kv_cache_quant_algo: KvCacheQuantAlgo = KvCacheQuantAlgo.NO_QUANT
    group_size: int = 128
    smoothquant_val: float = 0.5
    clamp_val: Optional[List[float]] = None
    exclude_modules: List[str] = Field(default_factory=lambda: ["lm_head"])
    pre_quant_scale: bool = False


class AttentionDpConfig(StrictBaseModel):
    """Reference: llm_args.py:633."""
    enable_balance: bool = False
    timeout_iters: int = 50
    batching_wait_iters: int = 10


class MoeConfig(StrictBaseModel):
    backend: str = "auto"            # auto|megablox|dense|ragged
    max_num_tokens: Optional[int] = None
    load_balancer: Optional[dict] = None


class SpeculativeConfig(StrictBaseModel):
    """Umbrella for spec-decode modes (reference: llm_args.py decoding configs)."""
    mode: Literal["NONE", "DRAFT_TARGET", "NGRAM", "EAGLE3", "MTP",
                  "SA", "AUTO", "PARD", "DFLASH", "USER_PROVIDED"] = "NONE"
    max_draft_len: int = 0
    # checkpoint dir path, torch module, or PretrainedConfig (dummy)
    draft_model: Optional[Any] = None
    # ngram
    ngram_max_matching_ngram_size: int = 4
    ngram_prompt_lookup_num_tokens: int = 4
    # PARD parallel draft (reference: speculative/pard.py): the draft
    # model predicts all K drafts in one forward over K mask tokens
    pard_mask_token_id: Optional[int] = None
    # suffix automaton (reference: speculative/suffix_automaton.py —
    # longest-earlier-suffix lookup; threshold suppresses weak matches)
    sa_threshold: int = 2
    # auto-disable drafting above this many concurrently drafted rows
    # (reference: speculation_gate.py + auto_heuristic.py max_concurrency)
    max_concurrency: Optional[int] = None
    # EAGLE3/MTP: run propose->verify->accept fused on device
    # (runtime/spec_window.py) so speculation rides the overlap
    # scheduler; False = host-orchestrated drafting (sync scheduler)
    device_window: bool = True
    # spec iterations per fused dispatch (0 = derive from
    # decode_multi_step)
    device_window_iters: int = 0
    # EAGLE3 top-b TREE proposal (reference: eagle3.py static tree):
    # b nodes per level, max_draft_len//b levels; 0 = linear chain.
    # Trees run on the host-orchestrated path (greedy tree verify).
    eagle_tree_width: int = 0
    # dynamic tree (reference: eagle3_dynamic_tree.py): the final tree
    # is the global top-max_draft_len cut over the whole candidate pool
    # by cumulative logprob — shape adapts per step under the token
    # budget. Expansion beam = eagle_tree_width.
    eagle_dynamic_tree: bool = False


class SparseAttentionConfig(StrictBaseModel):
    """Top-k page-sparse decode attention (reference:
    _torch/attention_backend/sparse/ — RocketKV block top-k, DSA
    indexer; llm_args.py:253-477). ``keep_pages`` bounds the pages a
    decode step attends per sequence (sink + tail pages always kept);
    contexts within the budget stay exact."""
    algo: Literal["ROCKET_TOPK", "DSA", "STAR"] = "ROCKET_TOPK"
    keep_pages: int = 16
    # STAR: context blocks attend anchor block 0 + themselves during
    # prefill; decode attends globally (reference: star_flashinfer.py)
    star_block_size: int = 1024


class CacheTransceiverConfig(StrictBaseModel):
    """KV-transfer transport for disaggregated serving (reference:
    llm_args.py CacheTransceiverConfig / cacheTransceiver.cpp backends —
    UCX/NIXL/MPI collapse to TCP-over-DCN on TPU pods; colocated
    processes use the in-proc store).

    ``backend="tcp"`` starts a pull listener: context engines store
    extracted KV locally and advertise ``(advertise_host, port)`` in
    ``DisaggregatedParams.opaque_state``; generation engines connect and
    pull. ``listen_port=0`` binds an ephemeral port."""
    backend: Literal["inproc", "tcp"] = "inproc"
    listen_host: str = "127.0.0.1"
    listen_port: int = 0
    # address other engines should dial (defaults to listen_host)
    advertise_host: Optional[str] = None
    max_tokens_in_buffer: Optional[int] = None


class ParallelConfig(StrictBaseModel):
    tensor_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    context_parallel_size: int = 1
    data_parallel_size: int = 1
    moe_tensor_parallel_size: int = -1
    moe_expert_parallel_size: int = -1
    enable_attention_dp: bool = False
    pp_partition: Optional[List[int]] = None


class LlmArgs(StrictBaseModel):
    """Top-level engine arguments (reference: BaseLlmArgs llm_args.py:2878
    + TorchLlmArgs:3762; §A.2-A.3). ``model`` may be an HF repo directory
    or a registered test config name."""
    model: str
    tokenizer: Optional[str] = None
    skip_tokenizer_init: bool = False
    trust_remote_code: bool = False
    dtype: str = "auto"                  # auto|bfloat16|float32
    revision: Optional[str] = None

    # parallelism (flattened, reference-style)
    tensor_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    context_parallel_size: int = 1
    # CP flavor (reference: CpType ULYSSES/RING/STAR/HELIX,
    # llm_args.py context_parallel config)
    cp_type: Literal["ULYSSES", "RING", "STAR", "HELIX"] = "ULYSSES"
    data_parallel_size: int = 1
    moe_tensor_parallel_size: int = -1
    moe_expert_parallel_size: int = -1
    enable_attention_dp: bool = False
    # DWDP: dp-shard the weights at rest, all-gather layer-by-layer in
    # the scan (reference: _torch/pyexecutor/dwdp.py DwdpManager)
    enable_dwdp: bool = False
    pp_partition: Optional[List[int]] = None

    # engine limits
    max_batch_size: int = 64
    max_input_len: int = 2048
    max_seq_len: Optional[int] = None
    max_num_tokens: int = 4096
    max_beam_width: int = 1

    # subsystem configs
    kv_cache_config: KvCacheConfig = Field(default_factory=KvCacheConfig)
    scheduler_config: SchedulerConfig = Field(default_factory=SchedulerConfig)
    bucketing_config: BucketingConfig = Field(default_factory=BucketingConfig)
    quant_config: QuantConfig = Field(default_factory=QuantConfig)
    moe_config: MoeConfig = Field(default_factory=MoeConfig)
    speculative_config: Optional[SpeculativeConfig] = None
    sparse_attention_config: Optional[SparseAttentionConfig] = None
    attention_dp_config: Optional[AttentionDpConfig] = None
    cache_transceiver_config: Optional[CacheTransceiverConfig] = None

    enable_lora: bool = False
    lora_config: Optional[Dict[str, Any]] = None
    enable_chunked_prefill: bool = True
    disable_overlap_scheduler: bool = False
    # decode steps allowed in flight before host consumes results; hides
    # the D2H fetch round-trip (the overlap scheduler generalized to
    # depth N; stop-token overshoot is bounded by this depth)
    max_inflight_steps: int = 4
    # decode iterations rolled into ONE jitted device program (lax.scan):
    # the host dispatches/fetches once per K tokens instead of per token.
    # Pure-decode batches only; per-token features (guided decoding,
    # drafts, logprobs, beams) fall back to single steps automatically.
    # Stop-string requests may briefly overshoot the stop by up to K-1
    # tokens (discarded before the response).
    decode_multi_step: int = 8
    # context tokens carried per decode-window step (mixed window): each
    # of the K scan steps ALSO prefills up to this many context tokens,
    # hiding prefill compute under the decode steps' weight-read
    # bandwidth so refill phases never run prefill-only programs while
    # decode rows idle (reference role: the overlap loop never idles the
    # device, py_executor.py:2870). 0 disables. Attention-pool models,
    # single-host role only.
    mixed_window_ctx: int = 0
    # throughput batching-wait (reference: AttentionDpConfig
    # batching_wait_iters / the ADP Balance waiting room, generalized):
    # while context work is scheduled AND the decode pool is below this
    # fraction of max_batch_size, decode rows sit out the iteration so
    # prefill refills the pool and windows run full. 0 disables (the
    # latency-friendly default); throughput benches set ~0.75. Progress
    # is guaranteed: rows only wait while context actually runs.
    decode_wait_occupancy: float = 0.0
    # TTFT budget (reference: bench/benchmark/low_latency.py regime +
    # the ADP waiting-room cap): when any not-yet-started request has
    # waited longer than this, decode windows shrink to multi_step/4 so
    # context work isn't parked behind depth*K decode steps. 0 = off.
    ttft_slo_ms: float = 0.0
    # micro-batches per iteration for TRUE pipeline parallelism (GPipe
    # schedule inside one jitted program, ppermute stage handoff;
    # reference: _executor_loop_pp py_executor.py:1811). Only active
    # when pipeline_parallel_size > 1; 1 = weight-sharded scan only.
    pp_microbatches: int = 1
    # pre-compile all token buckets at engine build (model_engine.warmup
    # analog); skipped automatically off-TPU
    enable_warmup: bool = True
    attn_backend: str = "AUTO"           # AUTO|RPA|REFERENCE
    sampler_type: str = "auto"
    load_format: Literal["auto", "dummy"] = "auto"
    enable_iter_perf_stats: bool = False
    stream_interval: int = 1
    gather_generation_logits: bool = False
    guided_decoding_backend: Optional[str] = None
    # tokenizer-free guidance byte mapping: "decimal" (token id's
    # decimal string — token-id-level grammars) or "byte" (token id ==
    # byte; byte-level checkpoints emit literal guided text)
    guided_token_bytes: str = "decimal"
    backend: str = "jax"
    num_postprocess_workers: int = 0
    batch_wait_timeout_ms: float = 0.0

    # pluggable external KV connector (reference: llm_args.py:1036
    # KvCacheConnectorConfig): {"connector_module": str,
    # "connector_worker_class": str, "connector_scheduler_class": str,
    # "kwargs": {...}} or {"instance": obj} for an in-process connector
    # implementing both halves
    kv_connector_config: Optional[Dict[str, Any]] = None

    # multi-host orchestration (reference: MGMN leader/follower intake,
    # executor_request_queue.py:42): {"role": "leader"|"follower",
    # "port": int, "num_followers": int (leader), "host": str (follower)}
    orchestrator_config: Optional[Dict[str, Any]] = None

    # free-form escape hatch for model ctor kwargs
    model_kwargs: Dict[str, Any] = Field(default_factory=dict)

    @model_validator(mode="after")
    def _fill_defaults(self):
        if self.max_seq_len is None:
            object.__setattr__(self, "max_seq_len", self.max_input_len + 2048)
        return self

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.pipeline_parallel_size *
                self.context_parallel_size * self.data_parallel_size)

    def to_mapping(self):
        from ..mapping import CpType, Mapping
        return Mapping.from_sizes(
            tp=self.tensor_parallel_size, pp=self.pipeline_parallel_size,
            cp=self.context_parallel_size, dp=self.data_parallel_size,
            moe_tp=self.moe_tensor_parallel_size,
            moe_ep=self.moe_expert_parallel_size,
            enable_attention_dp=self.enable_attention_dp,
            enable_dwdp=self.enable_dwdp,
            cp_type=CpType[self.cp_type])

    @classmethod
    def from_kwargs(cls, **kwargs) -> "LlmArgs":
        return cls(**kwargs)


def update_llm_args_with_extra_options(args_dict: dict, yaml_path: str) -> dict:
    """YAML overlay, reference ``--extra_llm_api_options`` semantics."""
    import yaml
    with open(yaml_path) as f:
        extra = yaml.safe_load(f) or {}
    merged = dict(args_dict)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(merged.get(k), dict):
            merged[k] = {**merged[k], **v}
        else:
            merged[k] = v
    return merged
