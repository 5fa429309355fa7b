"""Continuous-batching executor loop.

TPU-native analog of the reference ``PyExecutor``
(reference: tensorrt_llm/_torch/pyexecutor/py_executor.py:276; loop
variants _executor_loop:2591 and _executor_loop_overlap:2870). One
background thread per engine runs fetch→schedule→allocate→forward→
process-previous→respond. The overlap trick is structural: sampled tokens
stay on device indexed by sequence slot, the next step gathers them
in-graph, and the host processes iteration n-1's tokens while the device
executes iteration n — the same one-iteration-lag contract as the
reference's SampleState/SamplerEvent handoff (sampler.py:164-183).
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..logger import logger
from .kv_cache_manager import KVCacheManager, NoFreeBlocksError
from .model_engine import ModelEngine
from .request import FinishReason, LlmRequest, LlmRequestState
from .scheduler import RequestScheduler, ScheduledRequests


@dataclasses.dataclass
class CompletionOutput:
    index: int
    text: str = ""
    token_ids: List[int] = dataclasses.field(default_factory=list)
    cumulative_logprob: Optional[float] = None
    logprobs: Optional[list] = None
    finish_reason: Optional[str] = None


class GenerationResult:
    """Future-like handle for one request (reference:
    tensorrt_llm/executor/result.py GenerationResult)."""

    def __init__(self, request: LlmRequest, tokenizer=None,
                 streaming: bool = False, postproc_pool=None):
        self.request = request
        self.tokenizer = tokenizer
        self.streaming = streaming
        # detokenization offload (reference: num_postprocess_workers —
        # postproc_worker.py): chunk decode runs on the pool, the
        # executor loop only enqueues futures (order kept by the queue)
        self._pool = postproc_pool
        self._done = threading.Event()
        self._stream_queue: "queue.Queue" = queue.Queue()
        self.outputs: List[CompletionOutput] = []
        # per-prompt-position {token_id: logprob} dicts (None at pos 0),
        # populated at submission when SamplingParams.prompt_logprobs is
        # set (reference: result.py prompt_logprobs)
        self.prompt_logprobs: Optional[list] = getattr(
            request, "prompt_logprobs_result", None)
        self.error: Optional[Exception] = None

    @property
    def request_id(self) -> int:
        return self.request.request_id

    @property
    def prompt_token_ids(self) -> List[int]:
        return self.request.prompt_token_ids

    @property
    def finished(self) -> bool:
        return self._done.is_set()

    def result(self, timeout: Optional[float] = None) -> "GenerationResult":
        if not self._done.wait(timeout):
            raise TimeoutError(
                f"request {self.request_id} not finished within {timeout}s")
        if self.error is not None:
            raise self.error
        return self

    def __iter__(self):
        """Streaming iteration: yields incremental CompletionOutput."""
        while True:
            item = self._stream_queue.get()
            if item is None:
                break
            if hasattr(item, "result"):     # postproc future
                item = item.result()
            yield item

    # executor-side callbacks ------------------------------------------- #
    def _on_tokens(self, new_tokens: List[int]) -> None:
        if self.streaming:
            toks = list(new_tokens)

            def make():
                return CompletionOutput(
                    index=0, token_ids=toks,
                    text=self._safe_decode(toks))
            if self._pool is not None:
                self._stream_queue.put(self._pool.submit(make))
            else:
                self._stream_queue.put(make())

    def _on_finish(self) -> None:
        if self._pool is not None:
            self._pool.submit(self._finish_impl)
        else:
            self._finish_impl()

    def _finish_impl(self) -> None:
        req = self.request
        if self.streaming and req.num_tokens_streamed < req.num_output_tokens:
            tail = req.output_token_ids[req.num_tokens_streamed:]
            req.num_tokens_streamed = req.num_output_tokens
            self._on_tokens(tail)
        out = CompletionOutput(
            index=0,
            token_ids=list(req.output_token_ids),
            cumulative_logprob=req.cum_logprob or None,
            logprobs=req.logprobs or None,
            finish_reason=req.finish_reason.name.lower())
        out.text = self._safe_decode(req.output_token_ids)
        sp = req.sampling_params
        if sp.stop and out.text:
            for stop in sp.stop:
                idx = out.text.find(stop)
                if idx >= 0:
                    end = idx + (len(stop)
                                 if sp.include_stop_str_in_output else 0)
                    out.text = out.text[:end]
                    break
        self.outputs = [out]
        self._done.set()
        if self.streaming:
            self._stream_queue.put(None)

    def _on_error(self, err: Exception) -> None:
        self.error = err
        self._done.set()
        if self.streaming:
            self._stream_queue.put(None)

    def _safe_decode(self, token_ids) -> str:
        if self.tokenizer is None or not self.request.sampling_params.detokenize:
            return ""
        try:
            return self.tokenizer.decode(
                token_ids,
                skip_special_tokens=self.request.sampling_params.skip_special_tokens)
        except Exception:
            return ""


def _host_sample(logits: np.ndarray, sp, step_idx: int):
    """Host-side sampling for the logits-processor path (sync mode only;
    reference: TorchSampler applies per-request processors between
    forward and sample, sampler.py:1280)."""
    lf = logits.astype(np.float64)
    if sp.greedy:
        tok = int(np.argmax(lf))
    else:
        l = lf / max(sp.temperature, 1e-5)
        if sp.top_k > 0:
            kth = np.partition(l, -sp.top_k)[-sp.top_k]
            l = np.where(l < kth, -np.inf, l)
        if sp.top_p < 1.0:
            order = np.argsort(-l)
            p = np.exp(l[order] - l[order[0]])
            p = p / p.sum()
            keep = np.cumsum(p) - p <= sp.top_p
            mask = np.full_like(l, -np.inf)
            mask[order[keep]] = l[order[keep]]
            l = mask
        p = np.exp(l - np.max(l))
        p = p / p.sum()
        rng = np.random.default_rng(((sp.seed or 0) << 20) ^ step_idx)
        tok = int(rng.choice(len(p), p=p))
    logz = np.logaddexp.reduce(lf)
    return tok, float(lf[tok] - logz)


@dataclasses.dataclass
class _BatchEntry:
    request: LlmRequest
    samples_output: bool        # row's sampled token is a real output token
    drafts: List[int] = dataclasses.field(default_factory=list)
    parents: Any = None         # tree-draft parent indices (None = chain)


@dataclasses.dataclass
class _InflightBatch:
    entries: List[_BatchEntry]
    tokens: Any                 # device array future [S] or [K, S] (multi)
    logprobs: Any
    top_logprobs: Any = None    # optional (vals [S,K], ids [S,K])
    kind: str = "single"        # "single" | "multi" | "spec"
    emitted: Any = None         # multi/spec: device i32[S] token totals
    planned: Optional[List[int]] = None  # multi/spec: per-row budget
    hidden: Any = None          # EAGLE features [S*G, H] (device future)
    counts: Any = None          # spec: device i32[K, S] per-iter emits
    logits_rows: Any = None     # host logits-processor path: f32[S*G, V]
    moe_counts: Any = None      # wide-EP balancer: i32[L, E] routed tokens


@dataclasses.dataclass
class IterationStats:
    """Reference: IterationStats struct (py_executor.py:26-31)."""
    iter_counter: int = 0
    num_active_requests: int = 0
    num_queued_requests: int = 0
    num_ctx_tokens: int = 0
    num_gen_tokens: int = 0
    kv_cache_free_blocks: int = 0
    iter_latency_ms: float = 0.0
    # wide-EP balancer (runtime/moe_tracker.py): windowed max/mean
    # per-expert load ratio and cumulative auto-rebalances
    moe_expert_skew: Optional[float] = None
    moe_rebalances: int = 0


class PyExecutor:
    def __init__(self,
                 engine: ModelEngine,
                 kv_cache_manager: KVCacheManager,
                 scheduler: RequestScheduler,
                 tokenizer=None,
                 enable_overlap: bool = True,
                 stream_interval: int = 1,
                 drafter=None,
                 guided_decoder=None,
                 kv_transceiver=None,
                 pipeline_depth: int = 4,
                 decode_multi_step: int = 1,
                 role: str = "single",
                 broadcaster=None,
                 adp_router=None,
                 dp_rank_id: int = 0,
                 tracer=None,
                 kv_connector=None,
                 waiting_queue_policy: str = "fcfs",
                 decode_wait_occupancy: float = 0.0,
                 ttft_slo_ms: float = 0.0,
                 max_active_requests: Optional[int] = None,
                 num_postprocess_workers: int = 0):
        self.engine = engine
        self.kv = kv_cache_manager
        self.scheduler = scheduler
        self.tokenizer = tokenizer
        self.drafter = drafter
        self.guided_decoder = guided_decoder
        self.kv_transceiver = kv_transceiver
        # postprocess worker pool: detokenization off the executor loop
        # (reference: num_postprocess_workers, executor/postproc_worker.py)
        self._postproc = None
        if num_postprocess_workers > 0:
            from concurrent.futures import ThreadPoolExecutor
            self._postproc = ThreadPoolExecutor(
                num_postprocess_workers,
                thread_name_prefix="tllm-postproc")
        # external KV store hooks (KvConnectorManager)
        self.kv_connector = kv_connector
        self._save_parked: List[LlmRequest] = []
        # scheduler-v2 admission stage (reference: waiting_queue.py):
        # submissions wait here, ordered by policy, until the active set
        # has room; priority requests jump the line
        from .waiting_queue import create_waiting_queue
        self.waiting = create_waiting_queue(waiting_queue_policy)
        self.max_active_requests = max_active_requests or \
            4 * engine.max_batch_size
        self._pending_disagg: "queue.Queue" = queue.Queue()
        if guided_decoder is not None and guided_decoder.device is None \
                and enable_overlap:
            # host-matcher fallback: the matcher must see token t before
            # masking t+1. Device-resident guided decoding (the default;
            # guided/device_guided.py) has no such sync — it rides the
            # overlap loop and the multi-step window.
            enable_overlap = False
        if drafter is not None and engine.sd is None and enable_overlap:
            # host-orchestrated drafting needs the host-visible token
            # history one iteration ahead — sync scheduler. Device
            # windows (runtime/spec_window.py) have no such coupling:
            # proposal, verification and acceptance all run in-graph,
            # so EAGLE3/MTP ride the overlap loop (reference runs its
            # drafter inside the overlap loop too, py_executor.py:2671).
            enable_overlap = False
        self.enable_overlap = enable_overlap
        self.stream_interval = stream_interval
        # decode window: K decode iterations per dispatched device program
        # (lax.scan in the engine); 1 = classic one-token steps
        self.multi_step = max(1, decode_multi_step)
        # throughput batching-wait: defer decode while prefill can
        # refill the pool below this occupancy (llm_args
        # decode_wait_occupancy; reference analog: ADP Balance
        # batching_wait_iters)
        self.decode_wait_occupancy = decode_wait_occupancy
        # TTFT budget (llm_args.ttft_slo_ms; reference: low_latency.py
        # regime): when a not-yet-started request has waited past the
        # budget, decode windows dispatch at K/4 so prefill turnaround
        # is bounded by depth * K/4 steps instead of depth * K
        self.ttft_slo_ms = ttft_slo_ms
        self._iter_K = max(1, decode_multi_step)
        self.ttft_shrunk_iters = 0
        # steps allowed in flight before the host consumes results; >1
        # amortizes the device→host fetch round-trip (critical over a
        # TPU tunnel; the reference's overlap loop is depth 2)
        self.pipeline_depth = max(1, pipeline_depth) if enable_overlap else 1

        # multi-host orchestration (reference: executor_request_queue.py:42
        # rank-0 dequeue + broadcast): "single" | "leader" | "follower" |
        # "dp_leader" | "dp_follower".
        # leader/follower = SPMD replay: the leader schedules, followers
        # replay the identical jit calls (one logical engine).
        # dp_leader/dp_follower = ATTENTION-DP process groups (reference:
        # adp_router.py + AttentionDpConfig): each rank is a full engine
        # owning its request partition; the leader routes new requests by
        # the ADP balance policy (request.dp_rank) and followers stream
        # results back over the same socket.
        self.role = role
        self.broadcaster = broadcaster
        self.adp_router = adp_router
        self.dp_rank_id = dp_rank_id
        # per-request OTLP spans (llmapi/tracing.py RequestTracer)
        self.tracer = tracer
        if role == "dp_leader":
            broadcaster.start_result_reader()
        self._new_since_broadcast: List[LlmRequest] = []
        self._finished_since_broadcast: List[int] = []
        self._recv_rider_ids: List[int] = []
        self._by_id: Dict[int, LlmRequest] = {}
        # follower: request_id -> generated token ids (parity checking /
        # local observability; the leader serves the actual clients)
        self.completed_tokens: Dict[int, List[int]] = {}
        # dp-group bookkeeping: routed cost estimates + assignment log
        self._dp_cost: Dict[int, Tuple[int, int]] = {}
        self._dp_relaxed: List[LlmRequest] = []
        self.dp_assignments: Dict[int, int] = {}

        self._request_queue: "queue.Queue" = queue.Queue()
        self._results: Dict[int, GenerationResult] = {}
        self._active: List[LlmRequest] = []
        self._free_slots = list(range(engine.max_batch_size - 1, -1, -1))
        from collections import deque
        self._inflight: "deque[_InflightBatch]" = deque()
        self._shutdown = threading.Event()
        self._work_event = threading.Event()
        self._lock = threading.Lock()
        self.stats_history: List[IterationStats] = []
        self.iter_counter = 0
        import os
        self._trace_iters = os.environ.get("TLLM_TPU_TRACE_ITERS") == "1"
        self._eager_drain = os.environ.get("TLLM_TPU_EAGER_DRAIN") == "1"
        # host-phase span recorder (TLLM_TPU_HOST_TRACE=trace.json —
        # Chrome-trace of sched/dispatch/process per iteration;
        # profiler.SpanRecorder)
        from ..profiler import SpanRecorder
        self._spans = SpanRecorder()

        # beam groups keyed by parent request id
        self._beam_groups: Dict[int, Any] = {}

        from .hang_detector import HangDetector
        self._hang_detector = HangDetector(timeout_s=600.0)
        self._hang_detector.start()

        # per-request error isolation (error_isolation.py): requests
        # implicated in the iteration being dispatched, plus the loop's
        # fatal-promotion budget
        from .error_isolation import ErrorBudget
        self.error_budget = ErrorBudget()
        self._iter_requests: List[LlmRequest] = []

        # online wide-EP balancer (runtime/moe_tracker.py)
        self.moe_tracker = None
        if getattr(engine, "_moe_stats", False):
            from .moe_tracker import MoeLoadTracker
            lb = engine.args.moe_config.load_balancer or {}
            self.moe_tracker = MoeLoadTracker(engine, **lb)

        if role == "dp_follower":
            # announce rank immediately so the leader can attribute a
            # later socket death to this rank (liveness; reference:
            # proxy.py worker registration)
            try:
                broadcaster.send_result({"type": "hello",
                                         "rank": dp_rank_id})
            except (ConnectionError, OSError):  # pragma: no cover
                pass
            self._dp_recv_thread = threading.Thread(
                target=self._dp_follower_recv, daemon=True,
                name="tllm-dp-recv")
            self._dp_recv_thread.start()

        self._thread = threading.Thread(target=self._executor_loop,
                                        daemon=True, name="tllm-tpu-executor")
        self._thread.start()

    # ------------------------------------------------------------------ #
    # API
    # ------------------------------------------------------------------ #
    def submit(self, request: LlmRequest,
               kv_transfer_key: Optional[str] = None,
               kv_endpoint=None) -> GenerationResult:
        if self._shutdown.is_set():
            raise RuntimeError("executor is shut down")
        sp = request.sampling_params
        if sp.logits_processor is not None and self.enable_overlap:
            raise ValueError(
                "logits_processor needs the sync scheduler: build the LLM "
                "with disable_overlap_scheduler=True (reference gates "
                "per-request processors the same way)")
        if sp.no_repeat_ngram_size > 0:
            if sp.use_beam_search:
                raise ValueError(
                    "no_repeat_ngram_size is not supported with beam "
                    "search")
            if sp.logits_processor is not None:
                raise ValueError(
                    "no_repeat_ngram_size cannot combine with a "
                    "logits_processor (the in-graph history would record "
                    "the pre-processor sample)")
            if sp.no_repeat_ngram_size > 8:
                raise ValueError("no_repeat_ngram_size must be <= 8")
        res = GenerationResult(request, tokenizer=self.tokenizer,
                               streaming=request.streaming,
                               postproc_pool=self._postproc)
        with self._lock:
            self._results[request.request_id] = res
        from .request import LlmRequestType
        if request.sampling_params.use_beam_search:
            if self.enable_overlap:
                raise ValueError(
                    "beam search needs the sync scheduler: build the LLM "
                    "with disable_overlap_scheduler=True (or max_beam_width"
                    " > 1, which implies it)")
            from .beam_search import BeamGroup, make_beam_rows
            rows = make_beam_rows(request)
            group = BeamGroup(request, rows)
            group.steps = 0
            with self._lock:
                self._beam_groups[request.request_id] = group
            for row in rows:
                self._request_queue.put(row)
        elif request.request_type == \
                LlmRequestType.REQUEST_TYPE_GENERATION_ONLY:
            self._pending_disagg.put((request, kv_transfer_key,
                                      kv_endpoint))
        else:
            self._request_queue.put(request)
        self._work_event.set()
        return res

    def cancel(self, request_id: int) -> None:
        with self._lock:
            res = self._results.get(request_id)
        if res is not None:
            res.request.cancel()

    def shutdown(self, wait: bool = True) -> None:
        if self._postproc is not None:
            self._postproc.shutdown(wait=False)
        path = self._spans.dump()
        if path:
            logger.info("host-phase trace written to %s", path)
        self._shutdown.set()
        self._hang_detector.stop()
        self._work_event.set()
        if wait and self._thread.is_alive():
            self._thread.join(timeout=60)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    # ------------------------------------------------------------------ #
    # Main loop (reference: _executor_loop_overlap py_executor.py:2870)
    # ------------------------------------------------------------------ #
    def _executor_loop(self):
        """Loop supervisor: per-request error isolation + error budget
        (reference role: _torch/pyexecutor/error_classification.py:44,72
        — a recoverable failure fails only the implicated requests; the
        token-bucket budget promotes repeated or unrecoverable failures
        to fatal so the serving loop survives poison requests)."""
        from .error_isolation import RequestError
        while True:
            try:
                self._executor_loop_body()
                return
            except RequestError as e:
                fatal = self.error_budget.consume(str(e.cause))
                self._abort_request(e.request, e)
                if fatal:
                    self._die(e)
                    return
                logger.error("request %s failed at %s; budget %.2f — "
                             "loop continues",
                             getattr(e.request, "request_id", "?"),
                             e.stage, self.error_budget.budget)
            except Exception as e:
                import traceback
                traceback.print_exc()
                fatal = self.error_budget.consume(str(e))
                culprits = [r for r in self._iter_requests
                            if not r.is_finished]
                # mid-iteration state is poisoned: queued inflight
                # entries may reference the failed dispatch — drop them
                # and fail every implicated request, keeping the intact
                # waiting/active requests alive
                self._inflight.clear()
                for r in culprits:
                    self._abort_request(r, e)
                self._iter_requests = []
                if fatal or not culprits:
                    self._die(e)
                    return
                logger.error(
                    "executor iteration failed (%s); failed %d implicated"
                    " request(s), budget %.2f — loop continues", e,
                    len(culprits), self.error_budget.budget)

    def _ttft_urgent(self) -> bool:
        """True when any request that has not produced its first token
        has waited past the TTFT budget (llm_args.ttft_slo_ms)."""
        budget = self.ttft_slo_ms / 1e3
        now = time.monotonic()
        for req in self.waiting:
            arr = getattr(getattr(req, "perf", None), "arrival_time", None)
            if arr is not None and now - arr > budget:
                return True
        for req in self._active:
            p = getattr(req, "perf", None)
            if p is None or p.first_token_time:
                continue
            if p.arrival_time and now - p.arrival_time > budget:
                return True
        return False

    def _abort_request(self, req, exc) -> None:
        """Fail ONE request and release its resources; the loop lives."""
        from .request import FinishReason
        if not req.is_finished:
            req.finish_by_reason(FinishReason.ERROR)
        for fn in (lambda: self.kv.free_resources(req),
                   lambda: self._release_slot(req)
                   if req.seq_slot is not None else None):
            try:
                fn()
            except Exception:  # pragma: no cover - release best-effort
                pass
        if req in self._active:
            self._active.remove(req)
        with self._lock:
            res = self._results.pop(req.request_id, None)
        if res is not None:
            res._on_error(exc)

    def _die(self, e: Exception) -> None:
        logger.error("executor loop died: %s", e)
        with self._lock:
            results = list(self._results.values())
        for r in results:
            if not r.finished:
                r._on_error(e)

    def _executor_loop_body(self):

        while not self._shutdown.is_set():
            if self.role == "follower":
                batch = self._recv_schedule()
                if batch is None:
                    break
                self._hang_detector.arm()
                t0 = time.monotonic()
            else:
                if not self._active and not self._inflight:
                    self._work_event.wait(timeout=0.05)
                    self._work_event.clear()
                self._fetch_new_requests()
                self._admit_disagg_generation()
                self._reap_finished()
                if not self._active and not self._inflight:
                    self._hang_detector.disarm()
                    continue
                self._hang_detector.arm()
                t0 = time.monotonic()
                batch = self.scheduler.schedule(self._schedulable())
                # batching-wait: while context work is scheduled and
                # the decode pool is under the occupancy target,
                # decode rows sit out this iteration — prefill
                # refills the pool so windows run full instead of
                # re-reading the weights for near-empty row sets
                # (round-4 bench traces). Rows only ever wait while
                # context actually runs (progress guaranteed);
                # applied BEFORE the leader broadcast so followers
                # replay the same reduced schedule.
                if (self.decode_wait_occupancy > 0
                        and batch.context_requests
                        and batch.generation_requests
                        and len(batch.generation_requests) <
                        self.decode_wait_occupancy
                        * self.engine.max_batch_size):
                    paused0 = batch.paused_requests
                    batch = ScheduledRequests(
                        context_requests=batch.context_requests)
                    batch.paused_requests = paused0
                paused = getattr(batch, "paused_requests", None)
                # the leader broadcast moved AFTER rider carving so the
                # mixed-window carve plan ships with the schedule
                # (VERDICT r4 #8); snapshot the pre-split composition
                sched_snapshot = batch
                if paused:
                    self._pause_requests(paused, batch)
            # TTFT budget: shrink the decode window when someone has
            # waited past the SLO (single-engine roles only — K is
            # part of the dispatched program, so leader/follower
            # replay keeps the full window for identical schedules)
            self._iter_K = self.multi_step
            if (self.ttft_slo_ms > 0
                    and self.role in ("single", "dp_leader",
                                      "dp_follower")
                    and self._ttft_urgent()):
                self._iter_K = max(1, self.multi_step // 4)
                self.ttft_shrunk_iters += 1
            # mixed-eligibility decode batches: rows that qualify
            # for the fused speculative window split into their own
            # dispatch so one guided/logprobs/beam row doesn't
            # demote everyone else's speculation
            spec_side = None
            if (self.engine.sd is not None and self.role == "single"
                    and not batch.context_requests
                    and batch.generation_requests):
                elig = [r for r in batch.generation_requests
                        if self._spec_row_ok(r)]
                if elig and len(elig) < len(
                        batch.generation_requests):
                    rest = [r for r in batch.generation_requests
                            if not self._spec_row_ok(r)]
                    spec_side = ScheduledRequests(
                        generation_requests=elig)
                    batch = ScheduledRequests(
                        generation_requests=rest)
            # window kind for pure-decode batches: "spec" = fused
            # speculative window (runtime/spec_window.py), "multi" =
            # K-step decode window, None = plain single step
            wkind = None
            if not batch.is_empty and not batch.context_requests:
                if self._spec_window_ok(batch.generation_requests):
                    wkind = "spec"
                elif self._multi_step_ok(batch):
                    wkind = "multi"
            multi = wkind is not None
            # mixed ctx+gen batch whose gen rows qualify for a
            # window: split into two dispatches — a prefill
            # step and a decode window — so continuous re-admission
            # of new prompts doesn't demote every decode row to
            # one-token steps (the reference fuses ctx+gen into one
            # kernel launch; on TPU two queued XLA programs
            # back-to-back serve the same purpose without giving up
            # the device-resident decode loop)
            gen_window = None
            gwkind = None
            if (not multi and batch.context_requests
                    and batch.generation_requests):
                if self._spec_window_ok(batch.generation_requests):
                    gwkind = "spec"
                elif self.multi_step > 1 and \
                        self._multi_rows_ok(batch.generation_requests):
                    gwkind = "multi"
                if gwkind is not None:
                    gen_window = ScheduledRequests(
                        generation_requests=batch.generation_requests)
                    batch = ScheduledRequests(
                        context_requests=batch.context_requests)
            if spec_side is not None:
                self._prepare_resources_spec(spec_side)
                if spec_side.generation_requests:
                    tokens, logprobs, counts, emitted = \
                        self.engine.forward_spec_window(spec_side)
                    entries, planned = self._advance_spec(spec_side)
                    self._inflight.append(_InflightBatch(
                        entries, tokens, logprobs,
                        self.engine._last_spec_top_lp, kind="spec",
                        emitted=emitted, planned=planned,
                        counts=counts))
            if not batch.is_empty or gen_window is not None:
                if self.drafter is not None and not multi \
                        and self.engine.sd is None \
                        and self.role != "follower":
                    self._prepare_drafts(batch)
                if wkind == "spec":
                    self._prepare_resources_spec(batch)
                elif multi:
                    self._prepare_resources_multi(batch)
                else:
                    self._prepare_resources(batch)
                if gen_window is not None:
                    if gwkind == "spec":
                        self._prepare_resources_spec(gen_window)
                    else:
                        self._prepare_resources_multi(gen_window)
                if self.kv_connector is not None:
                    # ship connector metadata + land external KV in
                    # the freshly allocated pages before forward
                    self.kv_connector.begin_batch()
            # mixed window: carve eligible (resourced) context chunks
            # to ride INSIDE the decode window's scan steps, where
            # their prefill compute hides under the decode steps'
            # weight-read bandwidth; riders leave this iteration's
            # prefill program (VERDICT r3 #1 — no prefill-only
            # programs while decode rows idle)
            rider_ids: List[int] = []
            if (gen_window is not None and gwkind == "multi"
                    and batch.context_requests and self._mixed_ok()):
                if self.role == "follower":
                    # replay the leader's carve plan verbatim (the
                    # SerializableBatch rider_ids; VERDICT r4 #8)
                    by_id = {r.request_id: r
                             for r in batch.context_requests}
                    riders = [by_id[i] for i in self._recv_rider_ids
                              if i in by_id]
                else:
                    cap = self.engine.mixed_ctx_tokens * self._iter_K
                    riders, tot = [], 0
                    for r in batch.context_requests:
                        if tot >= cap:
                            break
                        if r.seq_slot is not None and \
                                self._ctx_rider_ok(r):
                            riders.append(r)
                            tot += min(r.context_chunk_size,
                                       r.context_remaining_length)
                if riders:
                    rider_ids = [r.request_id for r in riders]
                    gen_window.ctx_riders = riders
                    batch = ScheduledRequests(
                        context_requests=[
                            r for r in batch.context_requests
                            if r not in riders])
            if self.role == "leader":
                self._broadcast_schedule(sched_snapshot, paused,
                                         rider_ids=rider_ids)
            if batch.is_empty and gen_window is None:
                # nothing runnable; drain pending results
                self._process_inflight()
                continue
            t1 = time.monotonic()
            # implicated set for error isolation: if this iteration's
            # dispatch fails, exactly these requests are failed and the
            # loop survives for everyone else
            self._iter_requests = list(batch.all_requests)
            if gen_window is not None:
                self._iter_requests += gen_window.generation_requests
            if spec_side is not None:
                self._iter_requests += spec_side.generation_requests
            if multi or (gen_window is not None
                         and gen_window.generation_requests):
                wb = batch if multi else gen_window
                kind = wkind if multi else gwkind
                if kind == "spec":
                    tokens, logprobs, counts, emitted = \
                        self.engine.forward_spec_window(wb)
                    try:
                        tokens.copy_to_host_async()
                        logprobs.copy_to_host_async()
                        counts.copy_to_host_async()
                    except Exception:
                        pass
                    entries, planned = self._advance_spec(wb)
                    self._inflight.append(_InflightBatch(
                        entries, tokens, logprobs,
                        self.engine._last_spec_top_lp, kind="spec",
                        emitted=emitted, planned=planned,
                        counts=counts))
                else:
                    use_pen = any(r.sampling_params.needs_penalties
                                  for r in wb.all_requests)
                    riders = getattr(wb, "ctx_riders", None)
                    if riders:
                        tokens, logprobs, emitted, carved = \
                            self.engine.forward_multi_step(
                                wb, self._iter_K,
                                use_penalties=use_pen,
                                ctx_requests=riders)
                        self._advance_ctx_riders(riders, carved)
                    else:
                        tokens, logprobs, emitted = \
                            self.engine.forward_multi_step(
                                wb, self._iter_K,
                                use_penalties=use_pen)
                    try:
                        tokens.copy_to_host_async()
                        logprobs.copy_to_host_async()
                        emitted.copy_to_host_async()
                    except Exception:
                        pass
                    entries, planned = self._advance_multi(wb)
                    self._inflight.append(_InflightBatch(
                        entries, tokens, logprobs, kind="multi",
                        emitted=emitted, planned=planned))
            if not multi and not batch.is_empty:
                use_pen = any(r.sampling_params.needs_penalties
                              for r in batch.all_requests)
                mask = None
                if self.guided_decoder is not None:
                    mask = self.guided_decoder.build_mask(batch)
                mask = self._apply_bad_words(batch, mask)
                use_sd = self.engine.sd is not None
                wants_hidden = getattr(self.drafter,
                                       "wants_hidden_states", False) \
                    and not use_sd
                # device-window speculation: sampled rows seed the
                # draft head's pending (token, feature) pair without
                # leaving the device (spec_window.spec_seed)
                seed_rows, seed_slots = [], []
                seed_pos, seed_emit = [], []
                if use_sd:
                    # only context rows seed: generation rows on the
                    # single-step path were disqualified from spec
                    # windows for reasons that never change
                    # (sampling mode, logprobs, ...), so reseeding
                    # them is pointless
                    for i, r in enumerate(batch.context_requests):
                        if not r.is_last_context_chunk or \
                                r.seq_slot is None:
                            continue
                        seed_rows.append(i)
                        seed_slots.append(r.seq_slot)
                        seed_pos.append(r.context_len)
                        seed_emit.append(
                            r.context_len - r.prompt_len + 1)
                        r.spec_seeded = True
                use_proc = any(
                    r.sampling_params.logits_processor is not None
                    for r in batch.all_requests)
                if wants_hidden or seed_rows:
                    tokens, logprobs, top_lp, hidden = \
                        self.engine.forward_step(
                            batch, use_penalties=use_pen,
                            logits_mask=mask, collect_hidden=True,
                            collect_logits=use_proc)
                else:
                    hidden = None
                    tokens, logprobs, top_lp = self.engine.forward_step(
                        batch, use_penalties=use_pen, logits_mask=mask,
                        collect_logits=use_proc)
                logits_rows = self.engine._last_logits_rows \
                    if use_proc else None
                if seed_rows:
                    self.engine.spec_seed(tokens, hidden, seed_rows,
                                          seed_slots, seed_pos,
                                          seed_emit)
                    hidden = None  # device-consumed; host never reads
                try:  # start the D2H copy as soon as the step finishes
                    tokens.copy_to_host_async()
                    logprobs.copy_to_host_async()
                    if hidden is not None:
                        hidden.copy_to_host_async()
                except Exception:
                    pass
                entries = self._advance_device_state(batch)
                self._inflight.append(
                    _InflightBatch(entries, tokens, logprobs, top_lp,
                                   hidden=hidden,
                                   logits_rows=logits_rows,
                                   moe_counts=self.engine._last_moe_counts
                                   if self.moe_tracker is not None
                                   else None))
            t2 = time.monotonic()
            # opportunistically drain windows whose device results
            # already landed: finished requests release slots/KV at
            # the earliest possible iteration, so next-wave prefills
            # admit without waiting for the pipeline to fill (the
            # wave-boundary drain bubble measured in bench traces).
            # OPT-IN: jax.Array.is_ready() wedges the tunneled axon
            # backend (two reproduced hangs in device_get right
            # after polling), so the default relies on pipeline
            # depth alone.
            if self._eager_drain:
                while self._inflight and self._inflight_ready(
                        self._inflight[0]):
                    self._process_inflight()
            while len(self._inflight) >= self.pipeline_depth:
                self._process_inflight()
            t3 = time.monotonic()
            if self._spans.enabled:
                it = self.iter_counter
                self._spans.record("sched", t0, t1 - t0, it)
                self._spans.record("dispatch", t1, t2 - t1, it)
                self._spans.record("process", t2, t3 - t2, it)
            if self._trace_iters:
                ngen = len(batch.generation_requests) + \
                    (len(gen_window.generation_requests)
                     if gen_window is not None else 0)
                kind = wkind if multi else \
                    (f"split+{gwkind}" if gen_window is not None
                     else "single")
                print(f"# iter {self.iter_counter}: sched={1e3*(t1-t0):.1f} "
                      f"fwd={1e3*(t2-t1):.1f} proc={1e3*(t3-t2):.1f} "
                      f"ctx={len(batch.context_requests)} "
                      f"gen={ngen} {kind}",
                      flush=True)
            self._record_stats(batch, time.monotonic() - t0,
                               extra=gen_window)
        # drain at shutdown
        while self._inflight:
            self._process_inflight()
        if self.role == "dp_leader" and self.broadcaster is not None:
            from ..executor_orchestration.broadcast import \
                SerializableBatch
            self.broadcaster.broadcast(SerializableBatch(
                iter_id=-1, new_requests=[], context_chunks={},
                scheduled_ctx_ids=[], scheduled_gen_ids=[],
                draft_tokens={}, shutdown=True))
        if self.role == "leader" and self.broadcaster is not None:
            from ..executor_orchestration.broadcast import \
                SerializableBatch
            self.broadcaster.broadcast(SerializableBatch(
                iter_id=-1, new_requests=[], context_chunks={},
                scheduled_ctx_ids=[], scheduled_gen_ids=[],
                draft_tokens={}, shutdown=True))
    # ------------------------------------------------------------------ #
    def _fetch_new_requests(self):
        if self.role == "dp_leader":
            self._dp_leader_fetch()
        while True:
            try:
                req = self._request_queue.get_nowait()
            except queue.Empty:
                break
            self.waiting.add_request(req)
        # admission: move waiting -> active while there is room
        # (cancelled-in-queue requests finish immediately)
        while self.waiting and len(self._active) < self.max_active_requests:
            req = self.waiting.pop_request()
            if req.is_finished:
                self._finish_request(req)
                continue
            self._active.append(req)
            if self.role == "leader":
                self._new_since_broadcast.append(req)
                self._by_id[req.request_id] = req

    # ------------------------------------------------------------------ #
    # Multi-host orchestration (reference: executor_request_queue.py:42,
    # SerializableSchedulerOutput scheduler/scheduler.py:160)
    # ------------------------------------------------------------------ #
    def _broadcast_schedule(self, batch: ScheduledRequests, paused,
                            rider_ids=None) -> None:
        from ..executor_orchestration.broadcast import SerializableBatch
        sb = SerializableBatch.from_schedule(
            self.iter_counter, batch, self._new_since_broadcast,
            paused_ids=[r.request_id for r in (paused or [])],
            finished_ids=self._finished_since_broadcast)
        sb.rider_ids = list(rider_ids or [])
        self._new_since_broadcast = []
        self._finished_since_broadcast = []
        self.broadcaster.broadcast(sb)

    def _recv_schedule(self) -> Optional[ScheduledRequests]:
        """Follower: block for the leader's schedule, draining local
        inflight results while waiting. Returns None on shutdown."""
        while True:
            sb = self.broadcaster.recv_timeout(0.05)
            if sb is not None:
                break
            if self._inflight:
                self._process_inflight()
            if self._shutdown.is_set():
                return None
        if sb.shutdown:
            return None
        self._recv_rider_ids = list(getattr(sb, "rider_ids", []) or [])
        for req in sb.materialize_new_requests():
            self._active.append(req)
            self._by_id[req.request_id] = req
            with self._lock:
                self._results[req.request_id] = GenerationResult(req)
        # leader-authoritative finishes (cancellation); eos/length
        # finishes replay locally from the identical token stream
        for rid in sb.finished_ids:
            req = self._by_id.get(rid)
            if req is not None and not req.is_finished:
                req.cancel()
        self._reap_finished()
        batch = ScheduledRequests()
        for rid in sb.paused_ids:
            req = self._by_id.get(rid)
            if req is not None:
                batch.paused_requests.append(req)
        if batch.paused_requests:
            self._pause_requests(batch.paused_requests, batch)
            batch.paused_requests = []
        for rid in sb.scheduled_ctx_ids:
            req = self._by_id[rid]
            req.context_chunk_size = sb.context_chunks[rid]
            batch.context_requests.append(req)
        for rid in sb.scheduled_gen_ids:
            req = self._by_id[rid]
            req.draft_tokens = list(sb.draft_tokens.get(rid, []))
            batch.generation_requests.append(req)
        return batch

    def _admit_disagg_generation(self):
        """Generation-only admission: allocate pages (no prefix reuse —
        the injected KV must own its blocks), pull the context KV, skip
        the prefill phase (reference: DISAGG_GENERATION_INIT →
        TRANS_COMPLETE states, kv_cache_transceiver.py:107)."""
        while True:
            try:
                req, key, endpoint = self._pending_disagg.get_nowait()
            except queue.Empty:
                return
            try:
                if not self._free_slots:
                    self._pending_disagg.put((req, key, endpoint))
                    return
                req.seq_slot = self._free_slots.pop()
                self.kv.add_sequence(req, enable_reuse=False)
                self.kv_transceiver.receive_generation_kv(
                    req, key, endpoint=endpoint)
                req.state = LlmRequestState.GENERATION_IN_PROGRESS
                req.context_current_position = req.prompt_len
                req.num_device_tokens = req.prompt_len
                self._active.append(req)
            except Exception as e:
                res = self._results.pop(req.request_id, None)
                if res is not None:
                    res._on_error(e)

    def _schedulable(self) -> List[LlmRequest]:
        out = []
        for r in self._active:
            if r.is_finished:
                continue
            if r.is_generation_in_progress and not r.is_context_init_state:
                # length gate on device progress (overlap runs ahead)
                if r.num_device_tokens - r.prompt_len + 1 >= \
                        r.sampling_params.max_tokens:
                    continue
            if r.is_generation_in_progress and r.seq_slot is None:
                continue
            out.append(r)
        return out

    def _pause_requests(self, paused: List[LlmRequest],
                        batch: ScheduledRequests) -> None:
        """MAX_UTILIZATION eviction: release the paused requests' KV (into
        the reuse tree, so resume re-onboards the prefix) and reset them to
        CONTEXT_INIT for recompute-on-resume (reference:
        capacityScheduler.cpp MaxUtilizationScheduler + PauseRequests).
        Inflight steps may still reference these requests, so the pipeline
        drains first — pausing is rare (memory pressure), the sync is
        acceptable."""
        while self._inflight:
            self._process_inflight()
        for req in paused:
            if req.is_finished:
                continue
            logger.info("pausing request %d under memory pressure "
                        "(%d tokens recompute on resume)",
                        req.request_id, req.num_total_tokens)
            self.kv.free_resources(req, store_for_reuse=True)
            if req.seq_slot is not None:
                self._release_slot(req)
            req.pause_for_recompute()
            if req in batch.generation_requests:
                batch.generation_requests.remove(req)
            if req in batch.context_requests:
                batch.context_requests.remove(req)

    def _prepare_resources(self, batch: ScheduledRequests):
        """KV allocation + slot assignment
        (reference: resource_manager.prepare_resources:986)."""
        deferred = []
        new_slots = []
        for req in batch.context_requests:
            if req.seq_slot is None:
                if not self._free_slots:
                    # slots release one iteration after a request finishes
                    # (overlap lag); defer admission to the next iteration
                    deferred.append(req)
                    continue
                req.seq_slot = self._free_slots.pop()
                try:
                    reused = self.kv.add_sequence(req)
                except NoFreeBlocksError:
                    # pool exhausted (MAX_UTILIZATION over-admits by
                    # one-step need): defer to the next iteration
                    self._free_slots.append(req.seq_slot)
                    req.seq_slot = None
                    deferred.append(req)
                    continue
                if self.guided_decoder is not None and \
                        req.sampling_params.guided_decoding is not None:
                    try:
                        self.guided_decoder.on_slot_assigned(
                            req, self.engine)
                    except Exception as e:
                        from ..guided.device_guided import NoPoolSpaceError
                        self.kv.free_resources(req, store_for_reuse=False)
                        self._free_slots.append(req.seq_slot)
                        req.seq_slot = None
                        deferred.append(req)
                        if not isinstance(e, NoPoolSpaceError):
                            # grammar can never fit: fail the request
                            req.state = LlmRequestState.GENERATION_COMPLETE
                            res = self._results.get(req.request_id)
                            if res is not None:
                                res._on_error(e)
                        continue
                new_slots.append(req.seq_slot)
                sp = req.sampling_params
                if sp.no_repeat_ngram_size > 0:
                    # seed the device token history with the prompt
                    self.engine.write_history(req.seq_slot,
                                              req.prompt_token_ids)
                if sp.embedding_bias is not None:
                    self.engine.set_embedding_bias(req.seq_slot,
                                                   sp.embedding_bias)
                elif self.engine.bias_pool is not None:
                    # recycled slot must not inherit a previous bias
                    self.engine.set_embedding_bias(req.seq_slot, None)
                if getattr(req, "cross_states", None) is not None:
                    # cross-attention VLMs (mllama): upload the request's
                    # per-layer vision K/V into its slot at admission
                    self.engine.set_cross_state(req.seq_slot,
                                                req.cross_states)
                    req.cross_states = None
                elif isinstance(self.engine.kv_pages, dict) and \
                        "cross_len" in self.engine.kv_pages:
                    # text-only request on a cross-attn model: clear any
                    # stale vision state left in the reused slot
                    self.engine.clear_cross_state(req.seq_slot)
                if reused:
                    req.context_current_position = reused
                    req.perf.kv_cache_hit_tokens = reused
                if self.kv_connector is not None:
                    # external store may extend the radix-reused prefix
                    # (reference: py_executor.py:2641 connector hooks)
                    extra = self.kv_connector.query_match(req, reused)
                    extra = min(extra, req.context_len - 1 - reused)
                    extra -= extra % self.kv.tokens_per_block
                    if extra > 0:
                        req.context_current_position = reused + extra
                        req.perf.kv_cache_hit_tokens = reused + extra
                    self.kv_connector.after_alloc(req, extra)
                if req.perf.first_scheduled_time == 0:
                    req.perf.first_scheduled_time = time.monotonic()
        for req in deferred:
            batch.context_requests.remove(req)
        if new_slots:
            # recycled slots must not leak the previous occupant's token
            # history into the penalty counts
            self.engine.reset_slot_counts(new_slots)
        starved = []
        for req in batch.generation_requests:
            try:
                self.kv.add_token(req)
                if req.draft_tokens:
                    self.kv.add_draft_tokens(req, len(req.draft_tokens))
            except NoFreeBlocksError:
                # no room for even one token: skip this iteration; the
                # capacity scheduler pauses the tail next time around
                starved.append(req)
        for req in starved:
            req.draft_tokens = []
            batch.generation_requests.remove(req)

    # ------------------------------------------------------------------ #
    # Multi-step decode window (K tokens per dispatch)
    # ------------------------------------------------------------------ #
    def _multi_step_ok(self, batch: ScheduledRequests) -> bool:
        """A batch may take the K-step device-resident loop when it is
        pure decode and every per-token host intervention is absent:
        no guided decoding, drafts, bad-word masks, top-k logprobs, LoRA
        or beam rows. Stop *strings* are allowed — the host checks them
        every K tokens and discards the overshoot."""
        if self.multi_step <= 1 or batch.context_requests:
            return False
        return self._multi_rows_ok(batch.generation_requests)

    def _multi_rows_ok(self, gen_requests) -> bool:
        if self.drafter is not None:
            return False
        if self.guided_decoder is not None and \
                self.guided_decoder.device is None:
            return False
        if self.engine.max_draft_len:
            return False
        for r in gen_requests:
            sp = r.sampling_params
            if (sp.use_beam_search or sp.logprobs or sp.bad_token_ids
                    or sp.logits_processor is not None
                    or r.lora_task_id is not None or r.draft_tokens
                    or len(sp.stop_id_list()) > self.engine.NSTOP):
                return False
            if sp.guided_decoding is not None and \
                    not getattr(r, "guided_device", False):
                return False
        return True

    def _mixed_ok(self) -> bool:
        """Mixed (ctx-rider) windows need the plain attention KV pool.
        All roles qualify: the leader ships its carve plan in
        SerializableBatch.rider_ids and followers replay it verbatim
        (round 5 — multi-host serving keeps the mixed-window perf
        profile)."""
        e = self.engine
        return (e.mixed_ctx_tokens > 0
                and not e._vswa and not e._mrope and not e._mmg
                and not isinstance(e.kv_pages, dict))

    def _ctx_rider_ok(self, r) -> bool:
        from .request import LlmRequestType
        return (r.prompt_embeds is None
                and getattr(r, "cross_states", None) is None
                and r.lora_task_id is None
                and r.request_type ==
                LlmRequestType.REQUEST_TYPE_CONTEXT_AND_GENERATION)

    def _advance_ctx_riders(self, riders, carved) -> None:
        """Host bookkeeping after a mixed window: carved context wrote
        its KV in-window. A fully-prefilled prompt flips straight to
        generation with the LAST prompt token as the next step's input
        (its KV rewrite is idempotent), so the first output samples
        through the normal gen path — full feature support — without a
        separate prefill program."""
        for r, c in zip(riders, carved):
            if c <= 0:
                continue
            r.context_current_position += c
            if r.context_current_position >= r.context_len:
                r.state = LlmRequestState.GENERATION_IN_PROGRESS
                r.num_device_tokens = r.context_len - 1
                r.host_token_override = int(r.context_token_ids[-1])

    def _prepare_resources_multi(self, batch: ScheduledRequests) -> None:
        """Pre-allocate KV pages for each request's decode window and set
        its per-window token budget."""
        K = self._iter_K
        starved = []
        for req in batch.generation_requests:
            sp = req.sampling_params
            ndt = req.num_device_tokens
            # max(0, ·): a rider-flipped row sits one position BEFORE its
            # first output (it recomputes the last prompt token)
            outs = max(0, ndt - req.prompt_len)
            budget = max(1, min(K, sp.max_tokens - outs,
                                self.engine.max_seq_len - ndt))
            try:
                self.kv.add_tokens(req, budget)
                req.multi_step_budget = budget
            except NoFreeBlocksError:
                # the capacity scheduler admitted this request on its
                # ONE-token need; a K-token window may not fit under
                # pressure — degrade to a single step rather than starve
                # (starving everything would spin without ever pausing)
                try:
                    self.kv.add_token(req)
                    req.multi_step_budget = 1
                except NoFreeBlocksError:
                    starved.append(req)
        for req in starved:
            batch.generation_requests.remove(req)

    def _advance_multi(self, batch: ScheduledRequests):
        entries = []
        planned = []
        for req in batch.generation_requests:
            req.num_device_tokens += req.multi_step_budget
            req.host_token_override = None
            entries.append(_BatchEntry(req, samples_output=True))
            planned.append(req.multi_step_budget)
        return entries, planned

    def _process_multi(self, batch: _InflightBatch) -> None:
        import jax
        tokens, logprobs, emitted = jax.device_get(
            (batch.tokens, batch.logprobs, batch.emitted))
        # column-major views once: the per-token loop below was the
        # dominant host cost per window (bench traces: 150-300 ms of
        # pure Python per K=16 × 256-row window — as long as the device
        # window itself), so rows with pure length semantics take a
        # vectorized fast path
        tok_cols = tokens.T          # [Sb, K]
        lp_cols = logprobs.T
        finished: List[LlmRequest] = []
        for i, entry in enumerate(batch.entries):
            req = entry.request
            if req.is_finished:
                continue
            e = int(emitted[i])
            plan = batch.planned[i]
            sp = req.sampling_params
            if (e == plan and e > 0 and not sp.stop_token_ids
                    and (sp.end_id is None or sp.ignore_eos)
                    and not (sp.stop and self.tokenizer is not None)):
                # fast path: no stop ids / stop strings — the window can
                # only end by length. Bulk-append the whole emitted run.
                now = time.monotonic()
                if not req.output_token_ids:
                    req.perf.first_token_time = now
                req.perf.last_token_time = now
                # the device window may overrun max_tokens (its budget
                # is KV-room-capped, not length-capped): truncate here
                # and roll the device-token accounting back, exactly as
                # the per-token path does
                take = min(e, sp.max_tokens - req.num_output_tokens)
                row_t = tok_cols[i, :take].tolist()
                row_l = lp_cols[i, :take].tolist()
                req.output_token_ids.extend(row_t)
                req.cum_logprob += sum(row_l)
                req.logprobs.extend(
                    {t: l} for t, l in zip(row_t, row_l))
                if take < plan:
                    req.num_device_tokens -= plan - take
                if req.num_output_tokens >= sp.max_tokens:
                    req.finish_by_reason(FinishReason.LENGTH)
                    finished.append(req)
                elif req.streaming:
                    res = self._results.get(req.request_id)
                    if res is not None and \
                            req.num_output_tokens - \
                            req.num_tokens_streamed >= self.stream_interval:
                        new = req.output_token_ids[req.num_tokens_streamed:]
                        req.num_tokens_streamed = req.num_output_tokens
                        res._on_tokens(new)
                continue
            accepted = 0
            done = False
            check_stop_strings = bool(req.sampling_params.stop) and \
                self.tokenizer is not None
            for j in range(e):
                done = req.add_output_token(int(tokens[j, i]),
                                            float(logprobs[j, i]))
                accepted += 1
                if not done and check_stop_strings:
                    done = self._check_stop_strings(req)
                if done:
                    break
            if accepted < plan:
                # the device stopped early (or a stop string landed
                # mid-window): roll host bookkeeping back to the accepted
                # prefix so the KV accounting matches
                req.num_device_tokens -= plan - accepted
                if not done:
                    # defensive: device/host stop disagreement — resume
                    # from the corrected position (prev_tokens[slot] holds
                    # the last accepted token, so generation continues
                    # consistently)
                    logger.warning(
                        "request %d: device emitted %d of %d planned "
                        "tokens without a host-visible stop",
                        req.request_id, e, plan)
            res = self._results.get(req.request_id)
            if res is not None and not done and req.streaming and \
                    req.num_output_tokens - req.num_tokens_streamed >= \
                    self.stream_interval:
                new = req.output_token_ids[req.num_tokens_streamed:]
                req.num_tokens_streamed = req.num_output_tokens
                res._on_tokens(new)
            if done:
                finished.append(req)
        for req in finished:
            self._finish_request(req)
        self._reap_finished()

    # ------------------------------------------------------------------ #
    # Fused speculative window (runtime/spec_window.py)
    # ------------------------------------------------------------------ #
    def _spec_window_ok(self, gen_requests) -> bool:
        """Rows may take the fused propose/verify/accept window when all
        are greedy, seeded (prefill sampled through this engine), and
        free of per-token host interventions. Anything else decodes
        plainly (no speculation) — correct, just unaccelerated."""
        sd = self.engine.sd
        if sd is None or not gen_requests:
            return False
        return all(self._spec_row_ok(r) for r in gen_requests)

    def _spec_row_ok(self, r) -> bool:
        sd = self.engine.sd
        sp = r.sampling_params
        # sampled rows are welcome: seeded rows accept losslessly by
        # position-keyed sample-and-match, unseeded by true
        # rejection sampling (spec_window rejection_sample path)
        # greedy device-guided rows ride the window: the fused verify
        # re-argmaxes under the DFA mask sequentially (spec_window.py
        # guided x spec — reference: guided_decoder.py:373)
        guided_blocks = sp.guided_decoding is not None and not (
            getattr(r, "guided_device", False) and sp.greedy)
        if (sp.use_beam_search
                or sp.bad_token_ids or sp.needs_penalties
                or sp.embedding_bias is not None
                or sp.logits_processor is not None
                or r.lora_task_id is not None
                or guided_blocks
                or len(sp.stop_id_list()) > self.engine.NSTOP
                or not getattr(r, "spec_seeded", False)):
            return False
        outs = r.num_device_tokens - r.prompt_len
        room = self.engine.max_seq_len - r.num_device_tokens - sd.d
        return min(sp.max_tokens - outs, room) >= 1

    def _prepare_resources_spec(self, batch: ScheduledRequests):
        """KV pre-allocation for the fused window: the emission budget
        plus d slots of draft overshoot (the verify pass writes d+1
        positions per iteration; rejected-draft KV is overwritten by the
        next iteration's writes, never rewound)."""
        sd = self.engine.sd
        W = sd.K * (sd.d + 1)
        starved = []
        for req in batch.generation_requests:
            sp = req.sampling_params
            ndt = req.num_device_tokens
            outs = ndt - req.prompt_len
            budget = max(1, min(W, sp.max_tokens - outs,
                                self.engine.max_seq_len - ndt - sd.d))
            try:
                self.kv.add_tokens(req, budget + sd.d)
                req.spec_budget = budget
            except NoFreeBlocksError:
                try:
                    self.kv.add_tokens(req, 1 + sd.d)
                    req.spec_budget = 1
                except NoFreeBlocksError:
                    starved.append(req)
        for req in starved:
            batch.generation_requests.remove(req)

    def _advance_spec(self, batch: ScheduledRequests):
        entries, planned = [], []
        for req in batch.generation_requests:
            req.num_device_tokens += req.spec_budget
            req.host_token_override = None
            entries.append(_BatchEntry(req, samples_output=True))
            planned.append(req.spec_budget)
        return entries, planned

    def _process_spec(self, ib: _InflightBatch) -> None:
        import jax
        tokens, logprobs, counts = jax.device_get(
            (ib.tokens, ib.logprobs, ib.counts))  # [K, Sb, d+1], [K, Sb]
        top_lp = None
        if ib.top_logprobs is not None:
            tv, ti = jax.device_get(ib.top_logprobs)
            top_lp = (np.asarray(tv), np.asarray(ti))  # [K, Sb, Dp, kL]
        K = tokens.shape[0]
        finished: List[LlmRequest] = []
        for i, entry in enumerate(ib.entries):
            req = entry.request
            if req.is_finished:
                continue
            plan = ib.planned[i]
            sp = req.sampling_params
            if (self.drafter is None and top_lp is None
                    and not sp.stop_token_ids
                    and (sp.end_id is None or sp.ignore_eos)
                    and not (sp.stop and self.tokenizer is not None)):
                # vectorized fast path (same rationale as _process_multi:
                # the ragged K x (d+1) per-token loop is host-dominant at
                # production batch sizes). Gather the accepted prefix of
                # each verify step with one boolean mask, truncate at
                # max_tokens, roll device accounting back by the
                # unemitted remainder of the plan cap.
                cs = counts[:, i]
                keep = np.arange(tokens.shape[2])[None, :] < cs[:, None]
                row_t = tokens[:, i, :][keep].tolist()
                row_l = logprobs[:, i, :][keep].tolist()
                take = min(len(row_t),
                           sp.max_tokens - req.num_output_tokens)
                now = time.monotonic()
                if take > 0:
                    if not req.output_token_ids:
                        req.perf.first_token_time = now
                    req.perf.last_token_time = now
                    req.output_token_ids.extend(row_t[:take])
                    req.cum_logprob += sum(row_l[:take])
                    req.logprobs.extend(
                        {t: l} for t, l in zip(row_t[:take],
                                               row_l[:take]))
                if take < plan:
                    req.num_device_tokens -= plan - take
                if req.num_output_tokens >= sp.max_tokens:
                    req.finish_by_reason(FinishReason.LENGTH)
                    finished.append(req)
                elif req.streaming:
                    res = self._results.get(req.request_id)
                    if res is not None and \
                            req.num_output_tokens - \
                            req.num_tokens_streamed >= self.stream_interval:
                        new = req.output_token_ids[req.num_tokens_streamed:]
                        req.num_tokens_streamed = req.num_output_tokens
                        res._on_tokens(new)
                continue
            accepted = 0
            done = False
            check_stop = bool(req.sampling_params.stop) and \
                self.tokenizer is not None
            for k in range(K):
                ck = int(counts[k, i])
                if ck > 0 and self.drafter is not None:
                    # acceptance stats: ck-1 drafts accepted + 1 bonus
                    self.drafter.update(req, [0] * (ck - 1))
                for j in range(ck):
                    done = req.add_output_token(
                        int(tokens[k, i, j]), float(logprobs[k, i, j]))
                    if top_lp is not None and req.sampling_params.logprobs:
                        kk = req.sampling_params.logprobs
                        vals, ids2 = top_lp
                        req.logprobs[-1] = {
                            int(t): float(v)
                            for v, t in zip(vals[k, i, j][:kk],
                                            ids2[k, i, j][:kk])}
                        req.logprobs[-1].setdefault(
                            int(tokens[k, i, j]),
                            float(logprobs[k, i, j]))
                    accepted += 1
                    if not done and check_stop:
                        done = self._check_stop_strings(req)
                    if done:
                        break
                if done:
                    break
            if accepted < plan:
                # normal for speculation: the plan is an emission CAP —
                # rejected drafts emit nothing. Roll host bookkeeping
                # back to what the device actually produced.
                req.num_device_tokens -= plan - accepted
            res = self._results.get(req.request_id)
            if res is not None and not done and req.streaming and \
                    req.num_output_tokens - req.num_tokens_streamed >= \
                    self.stream_interval:
                new = req.output_token_ids[req.num_tokens_streamed:]
                req.num_tokens_streamed = req.num_output_tokens
                res._on_tokens(new)
            if done:
                finished.append(req)
        for req in finished:
            self._finish_request(req)
        self._reap_finished()

    def _advance_device_state(self, batch: ScheduledRequests
                              ) -> List[_BatchEntry]:
        entries = []
        for req in batch.context_requests:
            start = req.context_current_position
            end = min(req.context_len, start + req.context_chunk_size)
            last_chunk = end >= req.context_len
            req.context_current_position = end
            if last_chunk:
                req.state = LlmRequestState.GENERATION_IN_PROGRESS
                req.num_device_tokens = req.context_len
            entries.append(_BatchEntry(req, samples_output=last_chunk))
        for req in batch.generation_requests:
            drafts = list(req.draft_tokens)
            parents = getattr(req, "draft_parents", None)
            if parents is not None:
                parents = list(parents)[:len(drafts)]
            req.num_device_tokens += 1 + len(drafts)
            req.draft_tokens = []
            req.draft_parents = None
            req.host_token_override = None
            entries.append(_BatchEntry(req, samples_output=True,
                                       drafts=drafts, parents=parents))
        return entries

    def _prepare_drafts(self, batch: ScheduledRequests):
        """Speculative draft proposal (reference: drafter.prepare_draft_tokens
        call site py_executor.py:2671). Greedy rows verify by argmax
        equality; sampled rows verify losslessly in-graph (rejection
        sampling / seeded sample-and-match — sampling_ops.rejection_sample).
        Penalty requests are excluded: the count state can't be advanced
        mid-window."""
        def draftable(r):
            sp = r.sampling_params
            return (sp.guided_decoding is None
                    and not sp.needs_penalties
                    and sp.logits_processor is None
                    and not sp.use_beam_search)
        gen = [r for r in batch.generation_requests if draftable(r)]
        self.drafter.prepare_draft_tokens(gen)
        for req in batch.generation_requests:
            if not draftable(req):
                req.draft_tokens = []
                continue
            remaining = req.sampling_params.max_tokens - \
                req.num_output_tokens - 1
            room = self.engine.max_seq_len - (req.num_device_tokens + 1)
            cap = max(0, min(remaining, room, self.engine.max_draft_len))
            req.draft_tokens = req.draft_tokens[:cap]
            if getattr(req, "draft_parents", None) is not None:
                # tree drafts: greedy verification only (sampled tree
                # acceptance is a later extension); BFS order means a
                # truncated prefix keeps parent indices valid
                if not req.sampling_params.greedy:
                    req.draft_tokens = []
                    req.draft_parents = None
                else:
                    req.draft_parents = \
                        list(req.draft_parents)[:len(req.draft_tokens)]

    @staticmethod
    def _inflight_ready(ib: _InflightBatch) -> bool:
        try:
            return bool(ib.tokens.is_ready())
        except AttributeError:
            return False

    def _process_inflight(self):
        if not self._inflight:
            return
        batch = self._inflight.popleft()
        if batch.kind == "multi":
            self._process_multi(batch)
            return
        if batch.kind == "spec":
            self._process_spec(batch)
            return
        import jax
        tokens, logprobs = jax.device_get(
            (batch.tokens, batch.logprobs))    # sync point, one fetch
        if batch.moe_counts is not None and self.moe_tracker is not None:
            self.moe_tracker.observe(jax.device_get(batch.moe_counts))
        logits_np = None
        if batch.logits_rows is not None:
            logits_np = np.asarray(jax.device_get(batch.logits_rows))
            tokens = np.array(tokens)          # writable for overrides
            logprobs = np.array(logprobs)
        top_lp = None
        if batch.top_logprobs is not None:
            tl_vals, tl_ids = jax.device_get(batch.top_logprobs)
            top_lp = (np.asarray(tl_vals), np.asarray(tl_ids))
        hidden = None
        if batch.hidden is not None:
            hidden = np.asarray(jax.device_get(batch.hidden))  # [S*G, H]
        G = self.engine.max_draft_len + 1
        if G > 1:
            tokens = tokens.reshape(-1, G)
            logprobs = logprobs.reshape(-1, G)
        else:
            tokens = tokens[:, None]
            logprobs = logprobs[:, None]
        finished: List[LlmRequest] = []
        for i, entry in enumerate(batch.entries):
            req = entry.request
            if req.is_finished:
                continue  # stopped while this step was in flight
            if not entry.samples_output:
                continue  # mid-context chunk: logits unused
            proc = req.sampling_params.logits_processor
            if proc is not None and logits_np is not None:
                # host logits-processor path (sync mode): process the
                # row's logits, re-sample on host, and override the
                # device sample so every downstream consumer (stop
                # strings, streaming, host_token_override) sees it
                G_all = tokens.shape[1]
                row = logits_np[i * G_all].copy()
                try:
                    try:
                        out = proc(req.request_id, row,
                                   [list(req.output_token_ids)], None, None)
                    except TypeError:
                        out = proc(row)
                    if out is not None:
                        row = np.asarray(out, np.float64).reshape(-1)
                    tok_h, lp_h = _host_sample(row, req.sampling_params,
                                               req.num_output_tokens)
                except Exception as pe:
                    # poison processor: fail ONLY this request — the
                    # rest of the batch keeps decoding (reference:
                    # error_classification.py recoverable class)
                    from .error_isolation import RequestError
                    if self.error_budget.consume(str(pe)):
                        raise
                    self._abort_request(
                        req, RequestError(req, "logits_processor", pe))
                    continue
                tokens[i, 0] = tok_h
                logprobs[i, 0] = lp_h
            # greedy draft verification (reference: speculativeDecoding
            # acceptance-by-logits): accept the longest prefix of drafts
            # matching the target's own samples, plus one bonus token.
            # Tree drafts walk the tree instead: at each level accept the
            # child whose token matches the parent row's target sample.
            if entry.parents is not None and entry.drafts:
                path = []
                cur = -1
                while True:
                    row = 0 if cur < 0 else cur + 1
                    tgt = int(tokens[i, row])
                    nxt = next(
                        (j for j, pj in enumerate(entry.parents)
                         if pj == cur and entry.drafts[j] == tgt), None)
                    if nxt is None:
                        break
                    path.append(nxt)
                    cur = nxt
                accepted = len(path)
                # committed token g is the sample at the row of the node
                # that PRODUCED it (root row for g=0, node rows after);
                # the final row doubles as the bonus sample
                rows = [0] + [j + 1 for j in path]
            else:
                accepted = 0
                while accepted < len(entry.drafts) and \
                        int(tokens[i, accepted]) == entry.drafts[accepted]:
                    accepted += 1
                rows = list(range(accepted + 1))
            rejected = len(entry.drafts) - accepted
            done = False
            G_rows = tokens.shape[1]
            for g in range(accepted + 1):
                r = rows[g]
                done = req.add_output_token(int(tokens[i, r]),
                                            float(logprobs[i, r]))
                if hidden is not None:
                    # EAGLE feature of the position that PRODUCED this
                    # token (reference: eagle3 feature capture)
                    req.eagle_feats.append(
                        (int(tokens[i, r]), hidden[i * G_rows + r]))
                if top_lp is not None and req.sampling_params.logprobs:
                    vals, ids = top_lp
                    row = i * G_rows + r if vals.shape[0] > tokens.shape[0] \
                        else i
                    k = req.sampling_params.logprobs
                    req.logprobs[-1] = {
                        int(t): float(v)
                        for v, t in zip(vals[row][:k], ids[row][:k])}
                    req.logprobs[-1].setdefault(int(tokens[i, r]),
                                                float(logprobs[i, r]))
                if self.guided_decoder is not None:
                    self.guided_decoder.observe_token(req, int(tokens[i, r]))
                if not done and req.sampling_params.stop and \
                        self.tokenizer is not None:
                    done = self._check_stop_strings(req)
                if done:
                    # tokens past a stop are discarded
                    over = accepted - g
                    rejected += over
                    accepted = g
                    break
            if rejected:
                req.num_device_tokens -= rejected
                self.kv.rewind_tokens(req, 0)
            if entry.parents is not None and accepted:
                # accepted tree nodes live at node-indexed kv slots; move
                # them to their committed positional slots
                pos0 = req.num_device_tokens - 1 - accepted
                blocks = req.kv_block_ids
                ps = self.engine.page_size
                src, dst = [], []
                for k2, node in enumerate(path[:accepted], start=1):
                    si = pos0 + 1 + node
                    di = pos0 + k2
                    if si != di:
                        src.append(blocks[si // ps] * ps + si % ps)
                        dst.append(blocks[di // ps] * ps + di % ps)
                if src:
                    self.engine.fix_tree_kv(src, dst)
            if entry.drafts and self.drafter is not None:
                # acceptance telemetry for adaptive drafters
                acc_toks = [entry.drafts[j] for j in path[:accepted]] \
                    if entry.parents is not None else \
                    entry.drafts[:accepted]
                self.drafter.update(req, acc_toks)
            tok = int(tokens[i, rows[accepted]]) \
                if accepted < len(rows) else int(tokens[i, rows[-1]])
            if not self.enable_overlap:
                req.host_token_override = tok
            res = self._results.get(req.request_id)
            if res is not None and not done and req.streaming and \
                    req.num_output_tokens % self.stream_interval == 0:
                new = req.output_token_ids[req.num_tokens_streamed:]
                req.num_tokens_streamed = req.num_output_tokens
                res._on_tokens(new)
            if done:
                finished.append(req)
        for req in finished:
            self._finish_request(req)
        self._reap_finished()
        self._update_beam_groups()

    # ------------------------------------------------------------------ #
    # Attention-DP process groups (reference: scheduler/adp_router.py +
    # AttentionDpConfig "ADP Balance"): the leader routes each new
    # request to a dp rank; every rank runs its own full engine over its
    # partition; followers stream finished results back.
    # ------------------------------------------------------------------ #
    def _dp_follower_recv(self):
        while not self._shutdown.is_set():
            try:
                sb = self.broadcaster.recv_timeout(0.5)
            except (ConnectionError, OSError):
                break
            if sb is None:
                continue
            if sb.shutdown:
                self._shutdown.set()
                self._work_event.set()
                break
            for rid in sb.finished_ids:      # leader-side cancellations
                self.cancel(rid)
            for req in sb.materialize_new_requests():
                if req.dp_rank == self.dp_rank_id:
                    self.submit(req)

    def _dp_leader_fetch(self):
        from ..executor_orchestration.broadcast import SerializableBatch
        for msg in self.broadcaster.poll_results():
            self._dp_handle_result(msg)
        new = list(getattr(self, "_dp_relaxed", []))
        self._dp_relaxed = []
        while True:
            try:
                new.append(self._request_queue.get_nowait())
            except queue.Empty:
                break
        if not new:
            return
        ranks = self.adp_router.route_requests(new)
        routed, remote = [], []
        for req, r in zip(new, ranks):
            if r < 0:
                self._dp_relaxed.append(req)   # Balance relax window
                continue
            cost = req.context_len + req.sampling_params.max_tokens
            self.adp_router.rank_states[r].num_active_tokens += cost
            self._dp_cost[req.request_id] = (r, cost)
            self.dp_assignments[req.request_id] = r
            routed.append(req)
            if r != self.dp_rank_id:
                remote.append(req)
        if remote:
            self.broadcaster.broadcast(SerializableBatch.from_schedule(
                self.iter_counter, ScheduledRequests(),
                new_requests=remote))
        for req in routed:
            if req.dp_rank == self.dp_rank_id:
                self.waiting.add_request(req)

    def _dp_handle_result(self, msg: dict):
        # liveness (reference: executor/proxy.py:430-503): map follower
        # connections to dp ranks from their messages; a dead socket
        # fails exactly the requests routed to that rank — the leader
        # keeps serving its own partition (no hang, no global error)
        idx = msg.pop("__conn_index__", None)
        if not hasattr(self, "_dp_conn_rank"):
            self._dp_conn_rank: Dict[int, int] = {}
        if idx is not None and "rank" in msg:
            self._dp_conn_rank[idx] = msg["rank"]
        if msg.get("type") == "__follower_dead__":
            dead_rank = self._dp_conn_rank.get(msg.get("conn_index"))
            from .error_isolation import RequestError
            victims = [rid for rid, r in self.dp_assignments.items()
                       if r == dead_rank and r != self.dp_rank_id]
            logger.error("dp follower rank %s died; failing %d routed "
                         "request(s)", dead_rank, len(victims))
            for rid in victims:
                with self._lock:
                    res = self._results.pop(rid, None)
                self.dp_assignments.pop(rid, None)
                if res is not None and not res.finished:
                    res._on_error(RequestError(
                        res.request, "dp_follower_death",
                        ConnectionError(f"rank {dead_rank} died")))
            if dead_rank is not None and self.adp_router is not None:
                self.adp_router.remove_rank(dead_rank)
            return
        if msg.get("stats"):
            from .adp_router import RankState
            self.adp_router.update_rank_states(
                [RankState.deserialize(msg["stats"])])
        if msg.get("type") == "tokens":
            with self._lock:
                res = self._results.get(msg["request_id"])
            if res is not None:
                res._on_tokens(msg["token_ids"])
            return
        if msg.get("type") != "finish":
            return
        rid = msg["request_id"]
        rk, cost = self._dp_cost.pop(rid, (msg.get("rank", 0), 0))
        self.adp_router.rank_states[rk].num_active_tokens -= cost
        with self._lock:
            res = self._results.pop(rid, None)
        if res is None:
            return
        req = res.request
        req.output_token_ids = list(msg["token_ids"])
        req.logprobs = [{t: lp} for t, lp in
                        zip(msg["token_ids"], msg.get("logprobs") or [])]
        req.cum_logprob = sum(msg.get("logprobs") or [])
        req.finish_by_reason(FinishReason[msg["finish_reason"]])
        res._on_finish()

    def _dp_send_finish(self, req: LlmRequest):
        lps = [next(iter(d.values())) for d in (req.logprobs or [])]
        from .adp_router import RankState
        stats = RankState(
            rank=self.dp_rank_id,
            num_active_requests=len(self._active),
            num_active_tokens=sum(r.num_total_tokens
                                  for r in self._active),
            kv_free_blocks=self.kv.get_num_free_blocks()).serialize()
        try:
            self.broadcaster.send_result({
                "type": "finish", "rank": self.dp_rank_id,
                "request_id": req.request_id,
                "token_ids": list(req.output_token_ids),
                "logprobs": lps,
                "finish_reason": req.finish_reason.name,
                "stats": stats})
        except (ConnectionError, OSError):
            logger.error("dp follower: leader connection lost")

    def _release_slot(self, req: LlmRequest) -> None:
        if self.guided_decoder is not None:
            self.guided_decoder.on_slot_released(req, self.engine)
        self._free_slots.append(req.seq_slot)
        req.seq_slot = None

    def _reap_finished(self):
        """Complete requests finished out-of-band (cancellation)."""
        for req in [r for r in self._active if r.is_finished]:
            self._finish_request(req)
        if self.kv_connector is not None and self._save_parked:
            for req in self.kv_connector.poll_finished_saves():
                self.kv.free_resources(req)
                if req.seq_slot is not None:
                    self._release_slot(req)
                if req in self._save_parked:
                    self._save_parked.remove(req)

    def _update_beam_groups(self):
        if not self._beam_groups:
            return
        done_groups = []
        for pid, group in list(self._beam_groups.items()):
            rows = group.rows
            if any(r.is_context_init_state for r in rows):
                continue
            step = min(r.num_output_tokens for r in rows)
            if step <= group.steps:
                continue
            group.steps = step
            group.update(self.engine, self.kv)
            if group.done:
                done_groups.append(pid)
        for pid in done_groups:
            group = self._beam_groups.pop(pid)
            hyps = group.finalize()
            parent = group.parent
            parent.output_token_ids = list(hyps[0].tokens) if hyps else []
            parent.cum_logprob = hyps[0].score if hyps else 0.0
            parent.finish_by_reason(FinishReason.END_ID
                                    if (group.end_id is not None and hyps
                                        and hyps[0].tokens
                                        and hyps[0].tokens[-1] ==
                                        group.end_id)
                                    else FinishReason.LENGTH)
            with self._lock:
                res = self._results.pop(parent.request_id, None)
            if res is not None:
                res._on_finish()
                # attach runner-up hypotheses as extra outputs
                for j, h in enumerate(hyps[1:], start=1):
                    out = CompletionOutput(
                        index=j, token_ids=list(h.tokens),
                        cumulative_logprob=h.score,
                        text=res._safe_decode(h.tokens),
                        finish_reason=res.outputs[0].finish_reason)
                    res.outputs.append(out)
            for row in rows:
                row.cancel()
                self._finish_request(row)

    def _apply_bad_words(self, batch: ScheduledRequests, mask):
        """Single-token ban lists (SamplingParams.bad_token_ids) fold into
        the logits bitmask (reference: banBadWords kernels)."""
        reqs = batch.context_requests + batch.generation_requests
        if not any(r.sampling_params.bad_token_ids for r in reqs):
            return mask
        V = self.engine.model.vocab_size
        if mask is None:
            mask = np.ones((self.engine.max_batch_size, V), bool)
        for i, r in enumerate(reqs):
            for tid in (r.sampling_params.bad_token_ids or ()):
                if 0 <= tid < V:
                    mask[i, tid] = False
        return mask

    def _check_stop_strings(self, req: LlmRequest) -> bool:
        """Text-level stop sequences (SamplingParams.stop). Decodes a
        bounded tail — the reference does this in the postprocess workers."""
        sp = req.sampling_params
        if req.num_output_tokens < sp.min_tokens:
            return False
        max_stop = max(len(s) for s in sp.stop)
        tail_tokens = req.output_token_ids[-(max_stop + 8):]
        try:
            text = self.tokenizer.decode(tail_tokens,
                                         skip_special_tokens=True)
        except Exception:
            return False
        for stop in sp.stop:
            idx = text.find(stop)
            if idx >= 0:
                req.stop_text = text[:idx] if not \
                    sp.include_stop_str_in_output else text[:idx + len(stop)]
                req.finish_by_reason(FinishReason.STOP_WORDS)
                return True
        return False

    def _finish_request(self, req: LlmRequest):
        if self.tracer is not None:
            self.tracer.on_request_finished(req)
        if self.role == "leader":
            # followers replay eos/length finishes from the identical
            # token stream; only host-side finishes need broadcasting
            from .request import FinishReason
            if req.finish_reason in (FinishReason.CANCELLED,
                                     FinishReason.TIMED_OUT,
                                     FinishReason.STOP_WORDS):
                self._finished_since_broadcast.append(req.request_id)
            self._by_id.pop(req.request_id, None)
        if self.role == "follower":
            self.completed_tokens[req.request_id] = \
                list(req.output_token_ids)
            self._by_id.pop(req.request_id, None)
        if self.role == "dp_follower":
            self.completed_tokens[req.request_id] = \
                list(req.output_token_ids)
            self._dp_send_finish(req)
        if self.guided_decoder is not None:
            self.guided_decoder.drop(req.request_id)
        if self.drafter is not None and hasattr(self.drafter,
                                               "drop_request"):
            self.drafter.drop_request(req.request_id)
        from .request import LlmRequestType
        if (req.request_type == LlmRequestType.REQUEST_TYPE_CONTEXT_ONLY
                and self.kv_transceiver is not None):
            # context phase done: ship the KV before releasing the pages
            self.kv_transceiver.send_context_kv(req)
            req.state = LlmRequestState.DISAGG_CONTEXT_COMPLETE
        if self.kv_connector is not None and \
                self.kv_connector.on_request_finished(req):
            # async external save in flight: hold blocks + slot until
            # the worker reports the save done (poll in the loop)
            if req in self._active:
                self._active.remove(req)
            self._save_parked.append(req)
            with self._lock:
                res = self._results.pop(req.request_id, None)
            if res is not None:
                res._on_finish()
            return
        self.kv.free_resources(req)
        if req.seq_slot is not None:
            self._release_slot(req)
        if req in self._active:
            self._active.remove(req)
        with self._lock:
            res = self._results.pop(req.request_id, None)
        if res is not None:
            res._on_finish()

    def _record_stats(self, batch: ScheduledRequests, latency: float,
                      extra: Optional[ScheduledRequests] = None):
        self.iter_counter += 1
        ngen = len(batch.generation_requests) + \
            (len(extra.generation_requests) if extra is not None else 0)
        st = IterationStats(
            iter_counter=self.iter_counter,
            num_active_requests=len(self._active),
            num_queued_requests=self._request_queue.qsize(),
            num_ctx_tokens=sum(
                min(r.context_chunk_size, r.prompt_len)
                for r in batch.context_requests),
            num_gen_tokens=ngen,
            kv_cache_free_blocks=self.kv.get_num_free_blocks(),
            iter_latency_ms=latency * 1e3,
            moe_expert_skew=(self.moe_tracker.skew()
                             if self.moe_tracker is not None else None),
            moe_rebalances=(self.moe_tracker.rebalances
                            if self.moe_tracker is not None else 0))
        self.stats_history.append(st)
        if len(self.stats_history) > 1000:
            self.stats_history.pop(0)
