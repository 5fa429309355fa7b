"""The public ``LLM`` API.

Mirrors the reference LLM facade (reference: tensorrt_llm/llmapi/llm.py —
BaseLLM.generate:329, generate_async:432, _TorchLLM:1572): parse args →
load model/tokenizer → build engine + executor → submit requests as
futures. Differences are TPU-architectural: there is no MPI pool spawn —
a single controller process drives all local chips through one jitted
program (GSPMD); multi-host serving adds a gRPC request-broadcast layer
instead (see SURVEY.md §2.3 orchestration).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Iterable, List, Optional, Sequence, Union

import jax
import numpy as np

from ..logger import logger
from ..mapping import Mapping
from ..models import ModelConfig, get_model_class
from ..runtime.executor import GenerationResult, PyExecutor
from ..runtime.kv_cache_manager import KVCacheManager
from ..runtime.model_engine import ModelEngine
from ..runtime.request import LlmRequest
from ..runtime.scheduler import (CapacityScheduler, MicroBatchScheduler,
                                 RequestScheduler)
from ..quantization.mode import KvCacheQuantAlgo, QuantAlgo
from ..sampling_params import SamplingParams
from .llm_args import LlmArgs


import contextlib


@contextlib.contextmanager
def _creation_stage(stage: str):
    """Stage-tagged OOM explanation at engine bring-up (reference:
    py_executor_creator.py:116 memory-stage monitor — an allocation
    failure names the creation stage and the knob that relieves it)."""
    from ..runtime.error_isolation import classify_error, explain_stage_oom
    try:
        yield
    except Exception as e:
        if classify_error(str(e)) == "severe":
            raise RuntimeError(explain_stage_oom(stage, e)) from e
        raise

PromptInput = Union[str, Sequence[int]]


class RequestOutput:
    """Final result wrapper (reference: executor/result.py RequestOutput).
    May aggregate n>1 parallel samples (SamplingParams.n) — each sample is
    its own engine request sharing the prompt via the prefix cache."""

    def __init__(self, result: GenerationResult, prompt: Optional[str],
                 extra_results: Optional[List[GenerationResult]] = None):
        self._result = result
        self._extra = extra_results or []
        self.prompt = prompt

    @property
    def request_id(self) -> int:
        return self._result.request_id

    @property
    def prompt_token_ids(self):
        return self._result.prompt_token_ids

    @property
    def prompt_logprobs(self):
        return self._result.prompt_logprobs

    @property
    def outputs(self):
        outs = list(self._result.outputs)
        for i, r in enumerate(self._extra):
            for o in r.outputs:
                o.index = i + 1
                outs.append(o)
        return outs

    @property
    def finished(self) -> bool:
        return self._result.finished and all(r.finished for r in self._extra)

    def result(self, timeout: Optional[float] = None) -> "RequestOutput":
        self._result.result(timeout)
        for r in self._extra:
            r.result(timeout)
        return self

    def __iter__(self):
        return iter(self._result)

    def __repr__(self):
        return (f"RequestOutput(request_id={self.request_id}, "
                f"outputs={self.outputs!r})")


class LLM:
    """End-user entry point.

    ``model`` may be: a HF checkpoint directory, or (for tests/benchmarks)
    a live ``transformers`` model instance whose weights are ingested
    directly.
    """

    def __init__(self, model: Any, tokenizer: Any = None, **kwargs):
        if isinstance(model, (str, Path)):
            kwargs["model"] = str(model)
        else:
            kwargs["model"] = getattr(getattr(model, "config", None),
                                      "name_or_path", "") or "__inline__"
        self.args = LlmArgs(**kwargs)
        self._inline_model = None if isinstance(model, (str, Path)) else model
        self.tokenizer = tokenizer
        self.mapping = self.args.to_mapping()
        self.mesh = None
        if self.mapping.world_size > 1:
            self.mesh = self.mapping.build_mesh()

        self._build_model()
        if getattr(type(self.model), "is_encoder_only", False):
            # encoder models (BERT rerankers): no KV, no executor — one
            # jitted bidirectional pass per classify() call (reference:
            # modeling_bert.py served for reranking)
            self._encoder_params = self._params
            del self._params
            self.executor = None
            self.engine = None
            return
        from ..multimodal import create_input_processor
        self.input_processor = create_input_processor(self.model)
        self._build_executor()
        # opt-out anonymous usage telemetry, fail-silent (reference:
        # llm.py:279-296 + tensorrt_llm/usage/)
        from ..usage import UsageReporter
        self._usage = UsageReporter()
        self._usage.start(self, stats_fn=lambda: (
            len(self.executor.stats_history),
            sum(s.num_gen_tokens
                for s in self.executor.stats_history)))

    # ------------------------------------------------------------------ #
    # Build (reference: _TorchLLM._build_model llm.py:1476)
    # ------------------------------------------------------------------ #
    def _build_model(self):
        hf_config, state_dict = self._load_checkpoint()
        import jax.numpy as jnp
        dtype = {"auto": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                 "float32": jnp.float32}[self.args.dtype]
        sac = self.args.sparse_attention_config
        model_config = ModelConfig(
            hf_config=hf_config, dtype=dtype,
            quant_config=self.args.quant_config, mapping=self.mapping,
            sparse_keep_pages=(sac.keep_pages if sac and sac.algo in
                               ("ROCKET_TOPK", "DSA") else None),
            sparse_algo=(sac.algo if sac else "ROCKET_TOPK"),
            star_block_size=(sac.star_block_size if sac
                             and sac.algo == "STAR" else None))
        model_cls = get_model_class(hf_config.model_type)
        self.model = model_cls(model_config)
        backend_map = {"AUTO": "auto", "RPA": "rpa",
                       "REFERENCE": "reference", "VANILLA": "reference",
                       "HYBRID": "hybrid_decode"}
        self.model.attn_backend = backend_map.get(
            self.args.attn_backend.upper(), "auto")
        # (the groupwise Pallas dequant-matmul is GSPMD-partitionable via
        # custom_partitioning — ops/pallas/quant_matmul.py — so quantized
        # serving keeps the fused kernel under any mesh)
        if getattr(type(self.model), "has_recurrent_state", False):
            # recurrent state is not block-addressable: no chunked prefill,
            # no prefix reuse (reference: mamba/hybrid cache constraints)
            self.args.enable_chunked_prefill = False
            self.args.kv_cache_config.enable_block_reuse = False
        if getattr(self, "_checkpoint_kv_scales", None) is not None:
            self.model.checkpoint_kv_scales = self._checkpoint_kv_scales
        from ..quantization.mode import QuantAlgo
        if (self.args.quant_config.quant_algo in (
                QuantAlgo.W8A8_SQ_PER_CHANNEL,
                QuantAlgo.W8A8_SQ_PER_CHANNEL_PER_TOKEN_PLUGIN)
                and state_dict is not None
                and self._inline_model is not None
                and not getattr(self.model, "smooth_scales", None)):
            # actual SmoothQuant smoothing: calibrate per-channel act
            # maxima on the torch twin, fold s into the weights
            # (reference: quantize_by_modelopt int8_sq;
            # smoothquant_val is the alpha knob)
            from ..quantization.smoothquant import (
                calibrate_smooth_scales, default_calibration_ids)
            ids = default_calibration_ids(self.model.vocab_size)
            self.model.smooth_scales = calibrate_smooth_scales(
                self._inline_model, ids,
                alpha=self.args.quant_config.smoothquant_val)
        with _creation_stage("weights"):
            if state_dict is None:
                params = self.model.init_params(jax.random.PRNGKey(0))
            else:
                params = self.model.load_hf_state_dict(state_dict)
        self._params = params

    def _load_checkpoint(self):
        if self._inline_model is not None:
            m = self._inline_model
            if not hasattr(m, "state_dict"):
                # a bare PretrainedConfig: dummy-weight engine
                return m, None
            sd = {k: v.detach().cpu().float().numpy()
                  for k, v in m.state_dict().items()}
            if self.args.load_format == "dummy":
                sd = None
            if self.tokenizer is None and not self.args.skip_tokenizer_init:
                self.tokenizer = None  # inline models carry no tokenizer
            return m.config, sd
        path = Path(self.args.model)
        if not path.exists():
            raise FileNotFoundError(
                f"model path {path} not found (no network access: pass a "
                f"local checkpoint directory)")
        from transformers import AutoConfig
        hf_config = AutoConfig.from_pretrained(
            path, trust_remote_code=self.args.trust_remote_code)
        if self.tokenizer is None and not self.args.skip_tokenizer_init:
            try:
                from transformers import AutoTokenizer
                self.tokenizer = AutoTokenizer.from_pretrained(path)
            except Exception as e:
                logger.warning("tokenizer load failed: %s", e)
        if self.args.load_format == "dummy":
            return hf_config, None
        # lazy mmap'd (sharded) safetensors: tensors materialize one at a
        # time while the loaders stack/quantize, so peak host memory is
        # one tensor, not the checkpoint (reference: mmap weight_loader;
        # supports model.safetensors.index.json sharded layouts)
        from ..quantization.lazy_state_dict import LazyStateDict
        sd = LazyStateDict(path)
        # prequantized checkpoints (AWQ / GPTQ / ModelOpt): adopt the
        # checkpoint's own quant recipe and unpack its integer weights
        # (reference flow: quantize_by_modelopt.py hf_quant_config.json +
        # linear.py:2287 AWQ ingest)
        from ..quantization.checkpoint import (convert_state_dict,
                                               detect_prequantized,
                                               extract_kv_scales)
        pq = detect_prequantized(path)
        if pq is not None and pq.quant_algo is not None:
            qc = self.args.quant_config
            if qc.quant_algo != QuantAlgo.NO_QUANT and \
                    qc.quant_algo != pq.quant_algo:
                logger.warning(
                    "quant_config %s overridden by checkpoint's own %s",
                    qc.quant_algo, pq.quant_algo)
            qc.quant_algo = pq.quant_algo
            qc.group_size = pq.group_size
            qc.exclude_modules = sorted(
                set(qc.exclude_modules) | set(pq.exclude_modules))
            if pq.kv_cache_quant_algo is not None and \
                    qc.kv_cache_quant_algo == KvCacheQuantAlgo.NO_QUANT:
                qc.kv_cache_quant_algo = pq.kv_cache_quant_algo
            if qc.kv_cache_quant_algo != KvCacheQuantAlgo.NO_QUANT:
                scales = extract_kv_scales(sd, qc.kv_cache_quant_algo)
                if scales is not None:
                    self._checkpoint_kv_scales = scales
            sd = convert_state_dict(sd, pq)
            logger.info("ingested prequantized checkpoint: %s group=%d "
                        "(%d quantized tensors)", pq.quant_algo.value,
                        pq.group_size,
                        sum(1 for v in sd.values()
                            if not isinstance(v, np.ndarray)))
        return hf_config, sd

    def _build_two_model_drafter(self, sc, max_draft_len: int):
        """Build the draft engine for DRAFT_TARGET speculation
        (reference: _torch/speculative/model_drafter.py:1). The draft
        model may be a torch module, a PretrainedConfig (dummy weights)
        or a checkpoint directory path."""
        import jax
        import jax.numpy as jnp
        from ..speculative.model_drafter import TwoModelDrafter
        dm = sc.draft_model
        if dm is None:
            raise ValueError("DRAFT_TARGET needs speculative_config."
                             "draft_model")
        if isinstance(dm, (str, Path)):
            from transformers import AutoConfig
            path = Path(dm)
            hf_config = AutoConfig.from_pretrained(path)
            sd = {}
            from safetensors import numpy as st_numpy
            for f in sorted(path.glob("*.safetensors")):
                sd.update(st_numpy.load_file(str(f)))
            if not sd:
                sd = None
        elif hasattr(dm, "state_dict"):
            hf_config = dm.config
            sd = {k: v.detach().cpu().float().numpy()
                  for k, v in dm.state_dict().items()}
        else:  # a bare PretrainedConfig: dummy weights
            hf_config, sd = dm, None
        dtype = {"auto": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                 "float32": jnp.float32}[self.args.dtype]
        mc = ModelConfig(hf_config=hf_config, dtype=dtype)
        model = get_model_class(hf_config.model_type)(mc)
        params = model.load_hf_state_dict(sd) if sd is not None \
            else model.init_params(jax.random.PRNGKey(1))
        pard = sc.mode == "PARD"
        mask_id = sc.pard_mask_token_id
        if pard and mask_id is None:
            mask_id = getattr(hf_config, "mask_token_id", None) or \
                getattr(hf_config, "pard_token", None)
            if mask_id is None:
                raise ValueError(
                    "PARD needs pard_mask_token_id (or a draft config "
                    "carrying mask_token_id/pard_token) — reference: "
                    "speculative/pard.py mask token resolution")
        return TwoModelDrafter(
            model, params, max_draft_len=max_draft_len,
            max_slots=min(64, self.args.max_batch_size),
            max_seq_len=self.args.max_seq_len,
            parallel_draft=pard, mask_token_id=int(mask_id or 0))

    def _build_executor(self):
        args = self.args
        drafter = None
        max_draft_len = 0
        sc = args.speculative_config
        if sc is not None and sc.mode != "NONE":
            max_draft_len = sc.max_draft_len or 4
            if sc.mode == "USER_PROVIDED":
                # reference: UserProvidedDecodingConfig — the user hands
                # a Drafter instance (drafters may produce TREE drafts
                # via request.draft_parents; greedy tree verify)
                drafter = sc.draft_model
                drafter.max_draft_len = max_draft_len
            elif sc.mode == "AUTO":
                # reference: auto_heuristic.suggest_spec_config — pick a
                # model-free scheme sized by max batch, gated at high
                # concurrency. SA wins on repetitive/code suffixes at
                # small batch; NGram's bounded lookup is cheaper beyond.
                from ..speculative.ngram import NGramDrafter
                from ..speculative.suffix_automaton import \
                    SuffixAutomatonDrafter
                mc = sc.max_concurrency or 32
                if args.max_batch_size <= 8:
                    drafter = SuffixAutomatonDrafter(
                        max_draft_len=max_draft_len or 5,
                        threshold=sc.sa_threshold, max_concurrency=mc)
                else:
                    drafter = NGramDrafter(
                        max_draft_len=max_draft_len or 3,
                        max_matching_ngram_size=5)
                max_draft_len = drafter.max_draft_len
            elif sc.mode == "SA":
                from ..speculative.suffix_automaton import \
                    SuffixAutomatonDrafter
                drafter = SuffixAutomatonDrafter(
                    max_draft_len=max_draft_len,
                    threshold=sc.sa_threshold,
                    max_concurrency=sc.max_concurrency)
            elif sc.mode == "NGRAM":
                from ..speculative.ngram import NGramDrafter
                drafter = NGramDrafter(
                    max_draft_len=max_draft_len,
                    max_matching_ngram_size=sc.ngram_max_matching_ngram_size)
            elif sc.mode in ("DRAFT_TARGET", "PARD"):
                # PARD (reference: pard.py): the same two-model drafter
                # with ONE parallel forward over K mask tokens instead
                # of K autoregressive steps
                drafter = self._build_two_model_drafter(sc, max_draft_len)
            elif sc.mode in ("EAGLE3", "MTP", "DFLASH"):
                head_sd = None
                if sc.draft_model is not None and \
                        isinstance(sc.draft_model, (str, Path)):
                    from safetensors import numpy as st_numpy
                    head_sd = {}
                    for f in sorted(Path(sc.draft_model)
                                    .glob("*.safetensors")):
                        head_sd.update(st_numpy.load_file(str(f)))
                elif sc.draft_model is not None and \
                        hasattr(sc.draft_model, "state_dict"):
                    head_sd = {k: v.detach().cpu().float().numpy()
                               for k, v in sc.draft_model
                               .state_dict().items()}
                if sc.mode in ("EAGLE3", "DFLASH"):
                    from ..speculative.eagle import Eagle3Drafter
                    cls = Eagle3Drafter
                else:
                    from ..speculative.mtp import MtpDrafter
                    cls = MtpDrafter
                # device windows fuse propose/verify/accept in-graph
                # (runtime/spec_window.py); the drafter then only
                # supplies the head fn + params, so its own host-path
                # KV pool shrinks to one slot
                # fused windows run single-chip and under pure-TP
                # meshes (GSPMD propagates the target's shardings
                # through the window scan; the head stays replicated);
                # pp/cp/dp orchestration keeps the host drafter path
                spec_device = sc.device_window and \
                    (self.mapping.world_size == 1 or
                     self.mapping.tp_size == self.mapping.world_size) and \
                    sc.eagle_tree_width <= 1 and sc.mode != "DFLASH"
                drafter = cls(
                    self.model, self._params,
                    max_draft_len=max_draft_len,
                    max_slots=1 if spec_device
                    else min(32, args.max_batch_size),
                    max_seq_len=args.max_seq_len,
                    head_state_dict=head_sd)
                drafter.device_window = spec_device
                if hasattr(drafter, "tree_width"):
                    drafter.tree_width = sc.eagle_tree_width
                    drafter.dynamic_tree = sc.eagle_dynamic_tree
                if sc.mode == "DFLASH":
                    # block proposal on the host drafter path
                    drafter.parallel_block = True
                    drafter.mask_token_id = int(
                        sc.pard_mask_token_id or 0)
            else:
                raise NotImplementedError(
                    f"speculative mode {sc.mode} not yet supported")
        maw = args.kv_cache_config.max_attention_window
        if maw and hasattr(self.model, "enable_vswa"):
            # VSWA: per-window KV pools — the smallest window in the
            # list sizes the sliding pool (reference semantics: the
            # window list cycles over layers)
            self.model.enable_vswa(min(maw))
            # the multi-step window addresses both pools (dual-pool
            # page tables stacked on axis 0 — model_engine
            # _build_multi_step), so K-step decode stays on under VSWA
        spec_device = getattr(drafter, "device_window", False)
        with _creation_stage("kv_pool"):
            self.engine = ModelEngine(
                self.model, self._params, args,
                mapping=self.mapping, mesh=self.mesh,
                # device-window speculation verifies inside the fused
                # window; the plain step stays single-logit (G=1)
                max_draft_len=0 if spec_device else max_draft_len)
        del self._params
        if spec_device:
            from ..runtime.spec_window import enable_spec_device
            K = sc.device_window_iters or max(
                1, args.decode_multi_step // (max_draft_len + 1))
            enable_spec_device(self.engine, drafter, max_draft_len, K)
        # a single sequence can never exceed the KV pool: clamp the
        # engine-wide max_seq_len to pool capacity so no request is
        # admitted that could pause/recompute forever without ever
        # completing (reference sizes max_seq_len from KV memory the same
        # way: py_executor_creator.py:577 KvCacheCreator estimation)
        pool_tokens = (self.engine.num_kv_pages *
                       args.kv_cache_config.tokens_per_block)
        if pool_tokens < args.max_seq_len:
            logger.warning(
                "KV pool (%d tokens) is smaller than max_seq_len (%d); "
                "clamping max_seq_len to the pool capacity",
                pool_tokens, args.max_seq_len)
            args.max_seq_len = pool_tokens
        if (self.model.config.uses_kv_quant
                and getattr(self, "_checkpoint_kv_scales", None) is None):
            # no checkpoint-provided KV scales: calibrate from one prefill
            # pass (random tokens; callers with a tokenizer get real text)
            rng = np.random.default_rng(0)
            calib = rng.integers(1, max(2, self.model.vocab_size - 1),
                                 size=512)
            try:
                self.engine.calibrate_kv_scales(calib)
            except TypeError:
                logger.warning("model %s has no collect_kv_stats path; "
                               "using the default KV scale",
                               type(self.model).__name__)
        if args.enable_lora:
            from ..lora.lora_manager import LoraConfig, LoraManager
            if not hasattr(self.model, "lora_module_shapes"):
                raise NotImplementedError(
                    f"LoRA not supported for {type(self.model).__name__}")
            self.lora_manager = LoraManager(
                LoraConfig(**(args.lora_config or {})),
                num_layers=self.model.num_layers)
            self.engine.set_lora_manager(self.lora_manager)
            self.engine.refresh_lora()
        else:
            self.lora_manager = None
        if args.enable_warmup and jax.default_backend() == "tpu":
            logger.info("warming up %d token buckets...",
                        len(self.engine.token_buckets))
            with _creation_stage("warmup"):
                self.engine.warmup()
        kv_cls = KVCacheManager
        if os.environ.get("TLLM_TPU_NATIVE", "0") == "1":
            from ..runtime.native_block_manager import NativeKVCacheManager
            if NativeKVCacheManager.available():
                kv_cls = NativeKVCacheManager
            else:
                logger.warning("TLLM_TPU_NATIVE=1 but libtllm_tpu_host.so "
                               "not built; using the python block manager")
        kv_kwargs = {}
        host_bytes = args.kv_cache_config.host_cache_size
        if host_bytes and kv_cls is KVCacheManager:
            kv_kwargs = dict(
                host_cache_blocks=max(
                    1, host_bytes // self.engine.bytes_per_kv_block),
                offload_fn=self.engine.offload_page,
                onboard_fn=self.engine.onboard_page,
                secondary_offload_min_priority=(
                    args.kv_cache_config.secondary_offload_min_priority
                    or 0))
            if args.kv_cache_config.disk_cache_dir:
                # third tier: host-LRU victims demote to disk
                # (runtime/kv_tiers.py; reference: kv_cache_manager_v2)
                from ..runtime.kv_tiers import DiskKvStore
                dbytes = args.kv_cache_config.disk_cache_size
                kv_kwargs["disk_store"] = DiskKvStore(
                    args.kv_cache_config.disk_cache_dir,
                    max_blocks=max(1, dbytes //
                                   self.engine.bytes_per_kv_block)
                    if dbytes else 1 << 20)
        self.kv_cache_manager = kv_cls(
            num_blocks=self.engine.num_kv_pages,
            tokens_per_block=args.kv_cache_config.tokens_per_block,
            max_seq_len=args.max_seq_len,
            enable_block_reuse=args.kv_cache_config.enable_block_reuse,
            event_buffer_max_size=args.kv_cache_config.event_buffer_max_size,
            **kv_kwargs)
        if getattr(self.engine, "_vswa", False):
            from ..runtime.kv_cache_manager import VswaKvManager
            sliding_mgr = KVCacheManager(
                num_blocks=self.engine.num_sw_pages,
                tokens_per_block=args.kv_cache_config.tokens_per_block,
                max_seq_len=args.max_seq_len,
                enable_block_reuse=False)
            self.kv_cache_manager = VswaKvManager(
                self.kv_cache_manager, sliding_mgr,
                window=self.model.vswa_window)
        capacity = CapacityScheduler(
            max_num_requests=args.max_batch_size,
            kv_cache_manager=self.kv_cache_manager,
            policy=args.scheduler_config.capacity_scheduler_policy)
        micro = MicroBatchScheduler(
            max_batch_size=args.max_batch_size,
            max_num_tokens=args.max_num_tokens,
            enable_chunked_prefill=args.enable_chunked_prefill,
            chunking_policy=args.scheduler_config.context_chunking_policy,
            chunk_unit_size=args.kv_cache_config.tokens_per_block)
        guided_decoder = None
        if args.guided_decoding_backend:
            from ..guided.grammar_matcher import TokenTable
            from ..guided.guided_decoder import GuidedDecoder
            if self.tokenizer is not None:
                table = TokenTable.from_tokenizer(self.tokenizer)
            elif args.guided_token_bytes == "byte":
                # byte-level models (token id == byte; the committed
                # trained checkpoints): guidance over raw bytes, so
                # guided JSON/regex output is literal text
                V = self.model.vocab_size
                strs = [bytes([i]) for i in range(min(V, 256))] + \
                    [b""] * max(0, V - 256)
                table = TokenTable(strs, eos_token_id=0)
            else:
                # token-id-level guidance: bytes are decimal token ids —
                # usable for tests without a tokenizer
                table = TokenTable([str(i) for i in
                                    range(self.model.vocab_size)],
                                   eos_token_id=0)
            guided_decoder = GuidedDecoder(table, args.max_batch_size)
            # device-resident grammar walk (guided/device_guided.py):
            # guided requests ride the overlap scheduler + multi-step
            # window. Opt out (host-sync bitmasks) with backend
            # "dfa-host" or when explicitly running the sync scheduler.
            if args.guided_decoding_backend != "dfa-host":
                guided_decoder.attach_engine(
                    self.engine,
                    pool_states=int(os.environ.get(
                        "TLLM_TPU_GUIDED_POOL_STATES", "8192")))
        from ..disaggregation.transceiver import (InProcessKvTransport,
                                                  KvCacheTransceiver,
                                                  TcpKvTransport)
        tc = args.cache_transceiver_config
        self.kv_endpoint = None   # (host, port) other engines pull from
        if tc is not None and tc.backend == "tcp":
            transport = TcpKvTransport(listen_port=tc.listen_port,
                                       listen_host=tc.listen_host)
            self.kv_endpoint = (tc.advertise_host or tc.listen_host,
                                transport.listen_port)
        else:
            transport = InProcessKvTransport()
        self.kv_transceiver = KvCacheTransceiver(
            self.engine, self.kv_cache_manager, transport)
        kv_connector = None
        if args.kv_connector_config:
            from ..runtime.kv_connector import (KvCacheConnectorScheduler,
                                                KvConnectorManager)
            kc = args.kv_connector_config
            if "instance" in kc:
                worker = kc["instance"]
            else:
                import importlib
                mod = importlib.import_module(kc["connector_module"])
                kwargs = kc.get("kwargs", {})
                worker = getattr(mod, kc["connector_worker_class"])(**kwargs)
            sched = worker if isinstance(worker, KvCacheConnectorScheduler) \
                else None
            if "connector_scheduler_class" in (kc if "instance" not in kc
                                               else {}):
                sched = getattr(mod, kc["connector_scheduler_class"])(
                    **kc.get("kwargs", {}))
            worker.register_engine(self.engine)
            kv_connector = KvConnectorManager(worker, sched)
        role, bcaster, adp_router, dp_rank_id = "single", None, None, 0
        oc = args.orchestrator_config
        if oc:
            from ..executor_orchestration.broadcast import \
                RequestBroadcaster
            role = oc["role"]
            is_leader = role in ("leader", "dp_leader")
            bcaster = RequestBroadcaster(rank=0 if is_leader else 1)
            if is_leader:
                bcaster.serve(oc["port"], oc.get("num_followers", 1))
            else:
                bcaster.connect(oc.get("host", "127.0.0.1"), oc["port"])
            if role == "dp_leader":
                # attention-DP process group: the leader routes requests
                # across dp ranks by the ADP Balance policy (reference:
                # scheduler/adp_router.py:259, AttentionDpConfig)
                from ..runtime.adp_router import (DefaultADPRouter,
                                                  KVCacheAwareADPRouter)
                n = oc.get("num_followers", 1) + 1
                cls_r = KVCacheAwareADPRouter \
                    if oc.get("router") == "kv_aware" else DefaultADPRouter
                adp_router = cls_r(
                    num_ranks=n,
                    timeout_iters=oc.get("timeout_iters", 50),
                    batching_wait_iters=oc.get("batching_wait_iters", 10))
            if role == "dp_follower":
                dp_rank_id = oc.get("dp_rank", 1)
        from .tracing import RequestTracer
        tracer = RequestTracer.from_env()
        self.executor = PyExecutor(
            self.engine, self.kv_cache_manager,
            RequestScheduler(capacity, micro),
            tokenizer=self.tokenizer,
            enable_overlap=(not args.disable_overlap_scheduler
                            and args.max_beam_width <= 1),
            stream_interval=args.stream_interval,
            drafter=drafter,
            guided_decoder=guided_decoder,
            kv_transceiver=self.kv_transceiver,
            pipeline_depth=args.max_inflight_steps,
            decode_multi_step=args.decode_multi_step,
            decode_wait_occupancy=args.decode_wait_occupancy,
            ttft_slo_ms=args.ttft_slo_ms,
            role=role, broadcaster=bcaster,
            adp_router=adp_router, dp_rank_id=dp_rank_id,
            tracer=tracer,
            kv_connector=kv_connector,
            waiting_queue_policy=args.scheduler_config.waiting_queue_policy,
            max_active_requests=args.scheduler_config.max_active_requests,
            num_postprocess_workers=args.num_postprocess_workers)

    # ------------------------------------------------------------------ #
    # Generation (reference: llm.py:329-533)
    # ------------------------------------------------------------------ #
    def generate(self,
                 prompts: Union[PromptInput, Sequence[PromptInput]],
                 sampling_params: Optional[Union[SamplingParams,
                                                 List[SamplingParams]]] = None,
                 use_tqdm: bool = False) -> List[RequestOutput]:
        single = isinstance(prompts, (str, dict)) or (
            isinstance(prompts, Sequence) and prompts and
            isinstance(prompts[0], int))
        batch = [prompts] if single else list(prompts)
        if isinstance(sampling_params, SamplingParams) or sampling_params is None:
            sp_list = [sampling_params] * len(batch)
        else:
            sp_list = list(sampling_params)
        futures = [self.generate_async(p, sp) for p, sp in zip(batch, sp_list)]
        results = [f.result() for f in futures]
        return results[0] if single else results

    def generate_async(self,
                       prompt: PromptInput,
                       sampling_params: Optional[SamplingParams] = None,
                       streaming: bool = False,
                       lora_request=None,
                       cache_salt: Optional[str] = None,
                       disaggregated_params=None,
                       trace_headers=None) -> RequestOutput:
        # never mutate the caller's object: LLM.generate shares one
        # SamplingParams across every prompt in a batch, so the per-request
        # clamps below must land on a private copy (the reference
        # normalizes per-request params the same way)
        import copy as _copy
        sampling_params = _copy.copy(sampling_params) if sampling_params \
            else SamplingParams()
        prompt_embeds = None
        mm_data = None
        ptuning = None
        if isinstance(prompt, dict):
            # vLM input dict (reference: inputs/data.py PromptInputs):
            # {"prompt": str | ids, "multi_modal_data": {"image": [...]}}
            mm_data = prompt.get("multi_modal_data")
            prompt_embeds = prompt.get("prompt_embeds")
            ptuning = prompt.get("prompt_tuning_config")
            prompt = prompt.get("prompt",
                                prompt.get("prompt_token_ids"))
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string prompt requires a tokenizer")
            token_ids = self.tokenizer.encode(
                prompt, add_special_tokens=sampling_params.add_special_tokens)
            prompt_text = prompt
        else:
            token_ids = list(prompt)
            prompt_text = None
        if sampling_params.truncate_prompt_tokens:
            token_ids = token_ids[-sampling_params.truncate_prompt_tokens:]
        if len(token_ids) > self.args.max_input_len:
            raise ValueError(
                f"prompt length {len(token_ids)} exceeds max_input_len "
                f"{self.args.max_input_len}")
        # keep the request within engine sequence bounds (reference clamps
        # the same way at submission)
        room = self.args.max_seq_len - len(token_ids)
        if room < 1:
            raise ValueError("prompt leaves no room for generation within "
                             f"max_seq_len {self.args.max_seq_len}")
        sampling_params.max_tokens = min(sampling_params.max_tokens, room)
        if sampling_params.end_id is None and self.tokenizer is not None:
            eos = getattr(self.tokenizer, "eos_token_id", None)
            if eos is not None:
                sampling_params.end_id = eos
        from ..runtime.request import LlmRequestType
        rtype = LlmRequestType.REQUEST_TYPE_CONTEXT_AND_GENERATION
        kv_key = None
        kv_ep = None
        if disaggregated_params is not None:
            if disaggregated_params.request_type == "context_only":
                rtype = LlmRequestType.REQUEST_TYPE_CONTEXT_ONLY
                sampling_params.max_tokens = 1
            elif disaggregated_params.request_type == "generation_only":
                rtype = LlmRequestType.REQUEST_TYPE_GENERATION_ONLY
                kv_key = f"ctxkv-{disaggregated_params.ctx_request_id}"
                if disaggregated_params.opaque_state:
                    # ctx engine's pull endpoint rides in opaque_state
                    import msgpack
                    st = msgpack.unpackb(disaggregated_params.opaque_state,
                                         raw=False)
                    if st.get("kv_host"):
                        kv_ep = (st["kv_host"], st["kv_port"])
        lora_task_id = None
        if lora_request is not None:
            if self.lora_manager is None:
                raise ValueError("enable_lora=False: build the LLM with "
                                 "enable_lora=True for adapter requests")
            lora_task_id = lora_request.lora_int_id
            if self.lora_manager.slot_for(lora_task_id) < 0:
                if lora_task_id not in self.lora_manager._host_cache:
                    self.lora_manager.load_from_path(
                        lora_task_id, lora_request.lora_path)
                self.lora_manager.activate(lora_task_id)
                self.engine.refresh_lora()
        if mm_data is not None:
            proc = getattr(self, "input_processor", None)
            if proc is None:
                raise ValueError(
                    f"model {type(self.model).__name__} has no multimodal "
                    "input processor")
            out = proc(token_ids, mm_data)
            token_ids, prompt_embeds, salt = out[:3]
            # processors may attach extras (e.g. qwen2-vl M-RoPE
            # positions + delta) applied onto the request below
            mm_extra = out[3] if len(out) > 3 else None
            # image content keys the KV-reuse prefix (mm-hash): identical
            # text around different images must not share cache blocks
            cache_salt = (cache_salt or "") + salt
            if len(token_ids) > self.args.max_input_len:
                raise ValueError(
                    f"prompt with expanded image tokens ({len(token_ids)})"
                    f" exceeds max_input_len {self.args.max_input_len}")
        if ptuning is not None:
            # prompt tuning / p-tuning tables (reference: executor
            # PromptTuningConfig + promptTuningBuffers): virtual token
            # ids in [vocab, vocab + vtokens) resolve to rows of the
            # request's embedding table via the prompt-embeds path
            table = np.asarray(
                ptuning["embedding_table"] if isinstance(ptuning, dict)
                else ptuning.embedding_table, np.float32)
            vocab = self.model.vocab_size
            T = len(token_ids)
            if prompt_embeds is None:
                width = getattr(self.model, "prompt_embeds_width",
                                table.shape[1])
                prompt_embeds = np.full((T, width), np.nan, np.float32)
            else:
                prompt_embeds = np.asarray(prompt_embeds, np.float32)
            for i, t in enumerate(token_ids):
                if t < vocab:
                    continue
                if t - vocab >= table.shape[0]:
                    raise ValueError(
                        f"virtual token {t} outside the prompt table "
                        f"({table.shape[0]} rows from id {vocab})")
                prompt_embeds[i, :table.shape[1]] = table[t - vocab]
                token_ids[i] = 0   # row is overridden; id only keys reuse
            # table content keys the KV-reuse prefix (like mm-hash)
            import hashlib
            cache_salt = (cache_salt or "") + \
                hashlib.sha256(table.tobytes()).hexdigest()[:16]
        prompt_lp = None
        if sampling_params.prompt_logprobs is not None:
            # slow diagnostic path (reference: gather_context_logits):
            # one dedicated teacher-forced forward with logits at every
            # prompt position, outside the bucketed serving step
            if prompt_embeds is not None or mm_data is not None:
                raise ValueError("prompt_logprobs is unsupported with "
                                 "multimodal / prompt-embeds inputs")
            from ..evaluate.perplexity import prompt_logprob_dicts
            prompt_lp = prompt_logprob_dicts(
                self.model, self.engine.params, token_ids,
                top_k=int(sampling_params.prompt_logprobs))
        trace_ctx = None
        if trace_headers is not None:
            from .tracing import extract_trace_context
            trace_ctx = extract_trace_context(trace_headers)
        req = LlmRequest(prompt_token_ids=token_ids,
                         sampling_params=sampling_params,
                         streaming=streaming, cache_salt=cache_salt,
                         request_type=rtype,
                         lora_task_id=lora_task_id,
                         prompt_embeds=prompt_embeds)
        req.trace_ctx = trace_ctx
        if prompt_lp is not None:
            req.prompt_logprobs_result = prompt_lp
        if mm_data is not None and mm_extra:
            for k, v in mm_extra.items():
                setattr(req, k, v)
        if rtype == LlmRequestType.REQUEST_TYPE_GENERATION_ONLY:
            first = disaggregated_params.first_gen_tokens[0]
            req.host_token_override = first
            req.output_token_ids = [first]
        res = self.executor.submit(req, kv_transfer_key=kv_key,
                                   kv_endpoint=kv_ep)
        extra = []
        if sampling_params.n > 1 and not sampling_params.use_beam_search:
            import copy
            for j in range(1, sampling_params.n):
                sib_params = copy.copy(sampling_params)
                if sib_params.seed:
                    # seeded noise is a pure function of (seed, position):
                    # identical sibling seeds would produce n identical
                    # streams — fold the sample index into each sibling's
                    # seed so they diverge deterministically
                    sib_params.seed = (sampling_params.seed * 0x9E3779B1
                                       + j) & 0x7FFFFFFF or 1
                sibling = LlmRequest(
                    prompt_token_ids=list(token_ids),
                    sampling_params=sib_params,
                    streaming=False, cache_salt=cache_salt)
                extra.append(self.executor.submit(sibling))
        return RequestOutput(res, prompt_text, extra_results=extra)

    # ------------------------------------------------------------------ #
    # Sleep / wake / weight hot-swap (reference: /release_memory,
    # /resume_memory, /update_weights endpoints §A.5)
    # ------------------------------------------------------------------ #
    def release_memory(self) -> None:
        if self.executor._active:
            raise RuntimeError("cannot sleep with active requests")
        self.engine.release_weights()

    def resume_memory(self) -> None:
        self.engine.resume_weights()

    def update_weights(self, state_dict) -> None:
        import numpy as _np
        sd = {k: (v.detach().cpu().float().numpy()
                  if hasattr(v, "detach") else _np.asarray(v))
              for k, v in state_dict.items()}
        self.engine.update_weights(sd)

    def abort_request(self, request_id: int) -> None:
        """Cancel an in-flight request (reference: LLM.abort_request)."""
        self.executor.cancel(request_id)

    # ------------------------------------------------------------------ #
    def get_stats(self) -> list:
        return list(self.executor.stats_history)

    def get_kv_cache_events(self) -> list:
        return self.kv_cache_manager.get_latest_events()

    def rebalance_moe(self, expert_loads) -> None:
        """Wide-EP rebalance from observed loads (delegates to the
        engine; the executor's MoeLoadTracker calls the same path
        automatically when moe_config.load_balancer is set)."""
        return self.engine.rebalance_moe(expert_loads)

    def classify(self, prompts, token_type_ids=None):
        """Encoder-only scoring: list of token-id lists → [B, num_labels]
        logits (reference: BertForSequenceClassification serving)."""
        if not getattr(type(self.model), "is_encoder_only", False):
            raise ValueError("classify() requires an encoder-only model")
        if prompts and isinstance(prompts[0], int):
            prompts = [prompts]
        return self.model.classify(self._encoder_params, prompts,
                                   token_type_ids)

    def shutdown(self):
        if hasattr(self, "_usage"):
            self._usage.shutdown(self)
        if getattr(self, "executor", None) is not None:
            self.executor.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass
