"""Model engine: owns params + KV pools and drives the jitted step.

TPU-native analog of the reference ``PyTorchModelEngine``
(reference: tensorrt_llm/_torch/pyexecutor/model_engine.py:175 —
_prepare_tp_inputs:2347, forward:3927) fused with the CUDA-graph runner
(cuda_graph_runner.py:84): on TPU, *bucketed jit compilation* plays the
CUDA-graph role. Every iteration's ragged batch is padded up to
(token_bucket T, fixed seq capacity S), so after warmup each step hits a
cached XLA executable — the same reasoning as CUDA-graph padding
(+22% e2e in the reference, docs/source/developer-guide/overview.md:55).

The jitted step does: embed→layers(attention over paged KV)→logits→sample,
returning sampled tokens BY SLOT on device, so the next step's decode
inputs are gathered device-side without a host round-trip — this is what
makes the overlap scheduler (executor.py) free of host-sync on the token
path (reference overlap loop: py_executor.py:2870).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..llmapi.llm_args import LlmArgs
from ..logger import logger
from ..mapping import Mapping
from ..models.modeling_utils import DecoderModelForCausalLM
from ..ops.attention import AttentionMetadata
from ..ops.sampling_ops import SamplingTensors, sample
from .request import LlmRequest
from .scheduler import ScheduledRequests


@dataclasses.dataclass
class StepInputs:
    """Host-built (numpy) inputs for one iteration, pre-padding."""
    token_ids: np.ndarray          # i32[T] host-known tokens (0 where device-sourced)
    prev_slot: np.ndarray          # i32[T] slot to gather prev token from, -1=host
    positions: np.ndarray          # i32[T]
    kv_lens: np.ndarray            # i32[S]
    page_indices: np.ndarray       # i32[S, P]
    cu_q_lens: np.ndarray          # i32[S+1]
    num_seqs: np.ndarray           # i32[1]
    slot_mapping: np.ndarray       # i32[T]
    lora_slots: np.ndarray         # i32[T] (-1 = no adapter)
    logits_indices: np.ndarray     # i32[S*G] (G = logits gathered per seq)
    out_slots: np.ndarray          # i32[S] slot to scatter sampled token to (-1 pad)
    num_tokens: int                # actual (unpadded) token count
    num_reqs: int
    # VSWA sliding-pool tables (None for single-pool models)
    page_indices_sw: Optional[np.ndarray] = None
    slot_mapping_sw: Optional[np.ndarray] = None
    # M-RoPE 3-axis positions (None unless the model uses_mrope)
    positions_mrope: Optional[np.ndarray] = None
    # per-token image-group ids (None unless the model uses_mm_groups)
    mm_groups: Optional[np.ndarray] = None
    # tree-draft ancestry bitmasks (None = linear drafts only)
    tree_masks: Optional[np.ndarray] = None


class ModelEngine:
    def __init__(self,
                 model: DecoderModelForCausalLM,
                 params: Dict[str, Any],
                 args: LlmArgs,
                 mapping: Optional[Mapping] = None,
                 mesh=None,
                 num_kv_pages: Optional[int] = None,
                 max_draft_len: int = 0):
        self.model = model
        self.args = args
        # speculative decoding: logits gathered per sequence per step
        self.max_draft_len = max_draft_len
        self.mapping = mapping or Mapping()
        self.mesh = mesh
        self.max_batch_size = args.max_batch_size
        self.page_size = args.kv_cache_config.tokens_per_block
        self.max_seq_len = args.max_seq_len
        self.pages_per_seq = -(-self.max_seq_len // self.page_size)
        self.token_buckets = args.bucketing_config.resolve_token_buckets(
            args.max_num_tokens)
        # a decode-only full batch is the hottest shape: give it an exact
        # bucket so it never pads to the next power
        decode_bucket = min(self.max_batch_size * (max_draft_len + 1),
                            args.max_num_tokens)
        self.token_buckets = sorted(set(self.token_buckets) |
                                    {decode_bucket})
        self.seed_key = jax.random.PRNGKey(0)
        self.iter_counter = 0

        try:
            self._param_bytes_hint = sum(
                a.size * jnp.dtype(a.dtype).itemsize
                for a in jax.tree.leaves(params))
        except Exception:
            self._param_bytes_hint = None
        # VSWA (per-window pools): sliding layers get their own small
        # pool sized ~window tokens per sequence (reference:
        # resource_manager.py:1878)
        self._vswa = bool(getattr(model, "vswa_enabled", False))
        # M-RoPE (qwen2-vl): 3-axis positions ride three extra ints_t rows
        self._mrope = bool(getattr(model, "uses_mrope", False))
        # bidirectional image groups (gemma3-vl): one extra ints_t row
        self._mmg = bool(getattr(model, "uses_mm_groups", False))
        assert not (self._mrope and self._mmg)
        # NVFP4 KV: stamp the fp4-grid flag into the model's attention
        # specs so write_kv rounds appended K/V onto the e2m1 grid
        if getattr(model.config, "kv_fp4_grid", False):
            import dataclasses as _dc
            for attr in ("attn_spec", "sliding_spec"):
                sp = getattr(model, attr, None)
                if sp is not None:
                    setattr(model, attr, _dc.replace(sp, kv_fp4=True))
        self.num_kv_pages = num_kv_pages or self._default_num_pages()
        if self._vswa:
            w_pages = -(-(model.vswa_window + self.page_size)
                        // self.page_size) + 1
            # + one max-length prompt's transient pages: allocation runs
            # before the out-of-window trim at admission
            transient = -(-args.max_input_len // self.page_size)
            self.num_sw_pages = self.max_batch_size * w_pages \
                + transient + 1
        logger.info("KV pool: %d pages x %d tokens (%.1f MB/layer)",
                    self.num_kv_pages, self.page_size,
                    self._kv_bytes_per_layer() / 1e6)

        # device state
        if self.mesh is not None and self.mapping.world_size > 1:
            model.mesh = self.mesh  # enables shard_map'd attention
        self.params = self._shard_params(params)
        self.kv_pages = self._make_kv_pages()
        self.prev_tokens = jnp.zeros((self.max_batch_size,), jnp.int32)
        self._step_fns: Dict[Tuple, Any] = {}
        self._fix_kv_fn = None
        # multi-adapter LoRA (reference: PeftCacheManager + loraOp)
        self.lora_manager = None
        self.lora_params = None
        # device-resident guided decoding (guided/device_guided.py)
        self.g_enabled = False
        self._g_upload_fn = None
        self._g_set_fn = None
        # device-resident speculative windows (runtime/spec_window.py)
        self.sd = None
        # no-repeat-ngram token history + embedding-bias pool (lazy;
        # reference: banRepeatNgram kernels, embedding_bias in
        # sampling_params.py:96). Slot-indexed like prev_tokens.
        self.ngram_history = None
        self.bias_pool = None
        self._hist_set_fn = None
        self._bias_set_fn = None
        self._last_logits_rows = None
        # online wide-EP balancer (reference: moe_load_balancer.py):
        # when the model exposes MoE routing and the balancer is
        # configured, single-step forwards also emit per-expert
        # routed-token counts [L, E] (self._last_moe_counts)
        lb = getattr(getattr(args, "moe_config", None),
                     "load_balancer", None)
        self._moe_stats = bool(lb) and hasattr(model, "top_k")
        self._last_moe_counts = None

    # ------------------------------------------------------------------ #
    # Device-resident guided decoding state (pool arrays are jit operands;
    # allocation policy lives in guided/device_guided.py)
    # ------------------------------------------------------------------ #
    def enable_guided(self, token_bytes: np.ndarray, token_lens: np.ndarray,
                      eos_id: int, pool_states: int = 8192) -> None:
        V = self.model.vocab_size
        Vb = -(-V // 8)
        self.g_eos_id = int(eos_id)
        self.g_token_bytes = jnp.asarray(token_bytes.astype(np.uint8))
        self.g_token_lens = jnp.asarray(token_lens.astype(np.int32))
        self.g_byte_table = jnp.full((pool_states, 256), -1, jnp.int16)
        self.g_mask_bits = jnp.zeros((pool_states, Vb), jnp.uint8)
        self.g_eos_ok = jnp.zeros((pool_states,), bool)
        self.g_state = jnp.full((self.max_batch_size,), -1, jnp.int32)
        self.g_enabled = True

    def guided_upload(self, base: int, byte_table: np.ndarray,
                      mask_bits: np.ndarray, eos_ok: np.ndarray) -> None:
        """Land one grammar segment in the pool (rows [base, base+n);
        n is BLOCK-quantized by the manager so jit variants stay few)."""
        if self._g_upload_fn is None:
            def up(bt_pool, mb_pool, eos_pool, bt, mb, eos, base):
                return (jax.lax.dynamic_update_slice(bt_pool, bt, (base, 0)),
                        jax.lax.dynamic_update_slice(mb_pool, mb, (base, 0)),
                        jax.lax.dynamic_update_slice(eos_pool, eos, (base,)))
            self._g_upload_fn = jax.jit(up, donate_argnums=(0, 1, 2))
        self.g_byte_table, self.g_mask_bits, self.g_eos_ok = \
            self._g_upload_fn(self.g_byte_table, self.g_mask_bits,
                              self.g_eos_ok, jnp.asarray(byte_table),
                              jnp.asarray(mask_bits), jnp.asarray(eos_ok),
                              base)

    # ------------------------------------------------------------------ #
    # no-repeat-ngram history + per-slot embedding bias (reference:
    # cpp/tensorrt_llm/kernels/banRepeatNgram/, sampling_params.py:96)
    # ------------------------------------------------------------------ #
    def write_history(self, slot: int, tokens) -> None:
        """Upload a request's prompt into the slot-indexed token history
        (sampled tokens append in-graph)."""
        if self.ngram_history is None:
            self.ngram_history = jnp.zeros(
                (self.max_batch_size, self.max_seq_len), jnp.int32)
        row = np.zeros(self.max_seq_len, np.int32)
        m = min(len(tokens), self.max_seq_len)
        row[:m] = np.asarray(tokens[:m], np.int32)
        if self._hist_set_fn is None:
            def st(h, slot, row):
                return h.at[slot].set(row)
            self._hist_set_fn = jax.jit(st, donate_argnums=(0,))
        self.ngram_history = self._hist_set_fn(
            self.ngram_history, slot, jnp.asarray(row))

    def set_embedding_bias(self, slot: int, bias) -> None:
        """Land a request's [vocab] logit bias in the slot pool (None
        clears — required for recycled slots once the pool exists)."""
        if self.bias_pool is None:
            if bias is None:
                return
            self.bias_pool = jnp.zeros(
                (self.max_batch_size, self.model.vocab_size), jnp.float32)
        V = self.model.vocab_size
        vec = np.zeros(V, np.float32)
        if bias is not None:
            b = np.asarray(bias, np.float32).reshape(-1)
            vec[:min(V, b.shape[0])] = b[:V]
        if self._bias_set_fn is None:
            def st(p, slot, row):
                return p.at[slot].set(row)
            self._bias_set_fn = jax.jit(st, donate_argnums=(0,))
        self.bias_pool = self._bias_set_fn(self.bias_pool, slot,
                                           jnp.asarray(vec))

    def _aux_args(self, use_ngram: bool, use_bias: bool):
        """(history, bias_pool) jit operands, dummies when unused."""
        hist = self.ngram_history if use_ngram else \
            jnp.zeros((1, 1), jnp.int32)
        bias = self.bias_pool if use_bias else jnp.zeros((1, 1), jnp.float32)
        return hist, bias

    def guided_set_state(self, slot: int, state: int) -> None:
        """state = pool-global grammar state; -1 clears the slot."""
        if self._g_set_fn is None:
            def st(gs, slot, val):
                return gs.at[slot].set(val)
            self._g_set_fn = jax.jit(st, donate_argnums=(0,))
        self.g_state = self._g_set_fn(self.g_state, slot, state)

    # ------------------------------------------------------------------ #
    # Sizing
    # ------------------------------------------------------------------ #
    def _kv_bytes_per_layer(self) -> int:
        el = jnp.dtype(self.model.config.kv_cache_dtype).itemsize
        return (self.num_kv_pages * self.page_size *
                2 * self.model.num_kv_heads * self.model.head_dim * el)

    def _default_num_pages(self) -> int:
        """KV pool sizing from free device memory (the role of the
        reference's two-pass KvCacheCreator estimation,
        py_executor_creator.py:577-698)."""
        cfg = self.args.kv_cache_config
        if cfg.max_tokens is not None:
            return -(-cfg.max_tokens // self.page_size)
        el = jnp.dtype(self.model.config.kv_cache_dtype).itemsize
        bytes_per_page = (self.page_size * 2 * self.model.num_kv_heads *
                          self.model.head_dim * el * self.model.num_layers)
        try:
            stats = jax.devices()[0].memory_stats()
            free = stats["bytes_limit"] - stats["bytes_in_use"]
            budget = int(free * cfg.free_gpu_memory_fraction) - (1 << 30)
        except Exception:
            if jax.default_backend() == "tpu":
                # memory_stats unavailable (tunnel backend): budget from
                # total HBM minus the measured parameter bytes
                import os
                total = int(float(os.environ.get("TLLM_TPU_HBM_GB", "16"))
                            * (1 << 30))
                pbytes = self._param_bytes_hint or total // 4
                budget = int((total - pbytes) *
                             cfg.free_gpu_memory_fraction) - (1 << 30)
            else:
                budget = 2 << 30  # CPU/test fallback
        budget = max(budget, bytes_per_page * self.max_batch_size)
        pages = budget // bytes_per_page
        # at least enough for max_batch_size sequences of one page; at most
        # enough to cache every sequence fully
        pages = min(pages, self.max_batch_size * self.pages_per_seq + 1)
        return int(max(pages, self.max_batch_size + 1))

    # ------------------------------------------------------------------ #
    # Device state
    # ------------------------------------------------------------------ #
    def _shard_params(self, params):
        if self.mesh is None or self.mapping.world_size == 1:
            return jax.device_put(params)
        from jax.sharding import NamedSharding
        pspecs = self.model.param_pspecs(params)
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), pspecs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
        return jax.device_put(params, shardings)

    def _make_kv_pages(self):
        # recurrent-state models size their caches by sequence slots
        self.model._num_slots = self.max_batch_size
        if self._vswa:
            arr = self.model.make_kv_pages(
                self.num_kv_pages, self.page_size,
                num_sw_pages=self.num_sw_pages)
        else:
            arr = self.model.make_kv_pages(self.num_kv_pages,
                                           self.page_size)
        if self.mesh is not None and self.mapping.world_size > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            # kv_pspec covers the full cache pytree (array or dict)
            shardings = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s),
                self.model.kv_pspec(),
                is_leaf=lambda x: isinstance(x, PartitionSpec))
            arr = jax.device_put(arr, shardings)
        return arr

    # ------------------------------------------------------------------ #
    # Step compilation
    # ------------------------------------------------------------------ #
    def _pp_microbatches(self) -> int:
        """Micro-batch count for the true-PP pipelined step; 1 disables."""
        M = int(getattr(self.args, "pp_microbatches", 1) or 1)
        if (M <= 1 or self.mapping.pp_size <= 1 or self.mesh is None
                or not hasattr(self.model, "forward_pp")):
            return 1
        return M

    def _build_step(self, use_penalties: bool, use_mask: bool = False,
                    all_greedy: bool = False, num_logprobs: int = 0,
                    use_embeds: bool = False, use_lora: bool = False,
                    use_hidden: bool = False, use_tree: bool = False,
                    use_guided: bool = False, use_ngram: bool = False,
                    use_bias: bool = False, collect_logits: bool = False):
        model = self.model
        G = self.max_draft_len + 1  # logits gathered per sequence
        S = self.max_batch_size
        base_key = jax.random.PRNGKey(0)

        def step(params, kv_pages, prev_tokens, token_counts,
                 ints_t, ints_s, page_indices, floats, logits_mask,
                 input_embeds, lora_params, g_state, g_byte, g_mask,
                 g_eos_ok, g_tok_bytes, g_tok_lens, hist, bias_pool):
            # Per-step host metadata arrives packed in four arrays (the
            # tunnel/PCIe round-trip per transfer is the decode-latency
            # floor, so transfers are minimized):
            #   ints_t  i32[4, T]: token_ids, prev_slot, positions, slots
            #   ints_s  i32[...]: kv_lens|cu_q|logits_idx|out_slots|
            #                      top_k|greedy|num_seqs|counter
            #   floats  f32[6, S]: temp, top_p, min_p, rep, pres, freq
            token_ids, prev_slot, positions, slot_mapping = \
                (ints_t[0], ints_t[1], ints_t[2], ints_t[3])
            lora_slots = ints_t[4]
            pt_sw = sm_sw = None
            if self._vswa:
                sm_sw = ints_t[5]
                page_indices, pt_sw = page_indices[0], page_indices[1]
            extra = -1 if use_tree else 0
            pos_mrope = ints_t[extra - 3:extra or None] \
                if self._mrope else None
            mm_groups_q = ints_t[extra - 1] if self._mmg else None
            tree_masks = ints_t[-1] if use_tree else None
            o = 0
            kv_lens = ints_s[o:o + S]; o += S
            cu_q_lens = ints_s[o:o + S + 1]; o += S + 1
            logits_indices = ints_s[o:o + S * G]; o += S * G
            out_slots = ints_s[o:o + S]; o += S
            top_k = ints_s[o:o + S]; o += S
            greedy = ints_s[o:o + S].astype(bool); o += S
            num_seqs = ints_s[o:o + 1]; o += 1
            counter = ints_s[o]; o += 1
            row_seeds = ints_s[o:o + S]; o += S
            draft_ids = ints_s[o:o + S * G]; o += S * G  # -1 = no draft
            ngram_n = ints_s[o:o + S]  # no_repeat_ngram_size per row
            tree_lens = None
            if use_tree:
                _li = logits_indices.reshape(S, G)
                tree_lens = (_li[:, G - 1] - _li[:, 0]).astype(jnp.int32)
            metadata = AttentionMetadata(
                kv_lens=kv_lens, page_indices=page_indices,
                cu_q_lens=cu_q_lens, num_seqs=num_seqs,
                slot_mapping=slot_mapping, positions=positions,
                logits_indices=logits_indices, seq_slots=out_slots,
                page_indices_sw=pt_sw, slot_mapping_sw=sm_sw,
                positions_mrope=pos_mrope, mm_groups_q=mm_groups_q,
                tree_masks=tree_masks, tree_lens=tree_lens)
            sampling = SamplingTensors(
                temperature=floats[0], top_k=top_k, top_p=floats[1],
                min_p=floats[2], greedy=greedy,
                repetition_penalty=floats[3],
                presence_penalty=floats[4], frequency_penalty=floats[5])
            key = jax.random.fold_in(base_key, counter)

            # resolve device-sourced decode tokens (overlap path)
            from_prev = prev_slot >= 0
            gathered = prev_tokens[jnp.clip(prev_slot, 0)]
            tokens = jnp.where(from_prev, gathered, token_ids)
            embeds = input_embeds if use_embeds else None
            extra = {}
            if use_lora:
                extra = dict(lora=lora_params, lora_slots=lora_slots)
            M = self._pp_microbatches()
            hidden = jnp.zeros((0,), jnp.float32)
            moe_counts = jnp.zeros((0,), jnp.int32)
            if M > 1 and not use_embeds and not use_lora and G == 1:
                # true pipeline parallelism: micro-batched stages with
                # ppermute handoff (reference: py_executor.py:1811)
                logits, kv_pages = model.forward_pp(
                    params, tokens, kv_pages, metadata,
                    num_microbatches=M)
            elif use_hidden:
                # EAGLE draft features ride along with the logits
                logits, kv_pages, hidden = model.forward(
                    params, tokens, kv_pages, metadata,
                    input_embeds=embeds, collect_hidden=True, **extra)
            elif self._moe_stats:
                # per-expert routed-token counts for the online wide-EP
                # balancer (reference: moe_load_balancer.py statistics)
                logits, kv_pages, moe_counts = model.forward(
                    params, tokens, kv_pages, metadata,
                    input_embeds=embeds, collect_moe_stats=True, **extra)
            else:
                logits, kv_pages = model.forward(
                    params, tokens, kv_pages, metadata,
                    input_embeds=embeds, **extra)
            if use_mask:
                # guided-decoding bitmask (logitsBitmask.cu role)
                mask = logits_mask
                if G > 1:
                    mask = jnp.repeat(mask, G, axis=0)
                logits = jnp.where(mask, logits,
                                   jnp.finfo(jnp.float32).min)
            g_act = g_cur = None
            if use_guided:
                # device-resident grammar mask (guided/device_guided.py):
                # per-row state → packed per-state token bitmask. Rows
                # whose slot carries no grammar (state -1), padding and
                # mid-chunk rows (out_slots -1) pass through unmasked.
                g_cur = g_state[jnp.clip(out_slots, 0)]
                g_act = (out_slots >= 0) & (g_cur >= 0)
                gsc = jnp.clip(g_cur, 0)
                mb = g_mask[gsc]                            # [S, Vb] u8
                bits = (mb[:, :, None] >>
                        jnp.arange(8, dtype=jnp.uint8)) & 1
                allowed = bits.reshape(S, -1)[:, :logits.shape[-1]]
                allowed = allowed.astype(bool).at[:, self.g_eos_id].set(
                    g_eos_ok[gsc])
                neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
                logits = jnp.where(g_act[:, None] & ~allowed, neg, logits)
            if use_bias:
                # per-slot embedding bias folded into the logits
                # (reference: embedding_bias in dynamic decode)
                brow = bias_pool[jnp.clip(out_slots, 0)]
                brow = jnp.where((out_slots >= 0)[:, None], brow, 0.0)
                if G > 1:
                    brow = jnp.repeat(brow, G, axis=0)
                logits = logits + brow.astype(logits.dtype)
            if use_ngram:
                # no-repeat-ngram ban over the slot-indexed token history
                # (reference: banRepeatNgram kernels). The token being
                # sampled lands at sequence index kv_len.
                from ..ops.sampling_ops import ngram_ban_mask
                hrows = hist[jnp.clip(out_slots, 0)]
                ban = ngram_ban_mask(
                    hrows, ngram_n, kv_lens,
                    (out_slots >= 0) & (ngram_n > 0), logits.shape[-1])
                if G > 1:
                    ban = jnp.repeat(ban, G, axis=0)
                neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
                logits = jnp.where(ban, neg, logits)
            # token_counts is SLOT-indexed [num_slots, V]; logits rows are
            # batch-ordered — gather each row's count history by its slot
            # (rows with out_slots == -1 are padding/mid-chunk: row 0's
            # counts are read but the sample is discarded)
            counts = token_counts[jnp.clip(out_slots, 0)] \
                if use_penalties else None
            if all_greedy and not use_penalties:
                # fast path: no [S, V] sort, no gumbel — argmax + logprob
                lf = logits.astype(jnp.float32)
                new_tokens = jnp.argmax(lf, axis=-1).astype(jnp.int32)
                logz = jax.nn.logsumexp(lf, axis=-1)
                chosen = jnp.take_along_axis(
                    lf, new_tokens[:, None], axis=-1)[:, 0]
                logprobs = chosen - logz
            else:
                if G > 1:
                    # spec-decode verification: logits has S*G rows; repeat
                    # the per-seq sampling params per gathered position.
                    # Sampled rows use lossless acceptance: seeded rows
                    # sample-and-match with position-keyed noise (stream
                    # identical to non-speculative decoding), unseeded
                    # rows true rejection sampling (reference:
                    # speculativeDecoding rejection kernels)
                    sampling = jax.tree.map(
                        lambda a: jnp.repeat(a, G, axis=0), sampling)
                    counts = None if counts is None else \
                        jnp.repeat(counts, G, axis=0)
                    from ..ops.sampling_ops import rejection_sample
                    seeds_r = jnp.repeat(row_seeds, G, axis=0)
                    # seeded-noise position of logits row g must equal
                    # the kv_len the BASELINE would have when sampling
                    # that token: kv_lens includes the fed drafts, so
                    # subtract the per-row draft count (the spread of
                    # the row's logits indices)
                    li = logits_indices.reshape(S, G)
                    n_drafts = (li[:, G - 1] - li[:, 0]).astype(jnp.int32)
                    pos_base = kv_lens - n_drafts
                    pos_r = jnp.repeat(pos_base, G, axis=0) + \
                        jnp.tile(jnp.arange(G, dtype=jnp.int32), S)
                    new_tokens, logprobs = rejection_sample(
                        logits, sampling, key, draft_ids,
                        token_counts=counts, row_seeds=(seeds_r, pos_r))
                else:
                    seeds_arg = (row_seeds, kv_lens)
                    new_tokens, logprobs = sample(logits, sampling, key,
                                                  token_counts=counts,
                                                  row_seeds=seeds_arg)
            if G > 1:
                # slot scatter keys off the first sampled token per seq
                first = new_tokens.reshape(-1, G)[:, 0]
            else:
                first = new_tokens
            # scatter by slot for the next iteration's gather; invalid rows
            # (padding, out_slots == -1) are routed out of bounds and
            # dropped so they can't clobber live slots with stale values
            nslots = prev_tokens.shape[0]
            slot_idx = jnp.where(out_slots >= 0, out_slots, nslots)
            prev_tokens = prev_tokens.at[slot_idx].set(first, mode="drop")
            if use_ngram:
                # append the sampled token at its sequence index
                Lh = hist.shape[1]
                wrow = jnp.where((out_slots >= 0) & (kv_lens < Lh),
                                 out_slots, nslots)
                hist = hist.at[wrow, jnp.clip(kv_lens, 0, Lh - 1)].set(
                    first, mode="drop")
            if use_guided:
                # advance the grammar: walk the sampled token's bytes
                # through the pooled byte DFA (the token-level transition
                # matrix never materializes on device)
                fb = g_tok_bytes[first].astype(jnp.int32)   # [S, L]
                flen = g_tok_lens[first]                    # [S]

                def walk(j, st):
                    nxt = g_byte[jnp.clip(st, 0), fb[:, j]].astype(
                        jnp.int32)
                    return jnp.where((j < flen) & (st >= 0), nxt, st)
                ns = jax.lax.fori_loop(0, fb.shape[1], walk,
                                       g_cur.astype(jnp.int32))
                ns = jnp.where(first == self.g_eos_id, g_cur, ns)
                g_state = g_state.at[
                    jnp.where(g_act, out_slots, S)].set(
                        jnp.where(g_act, ns, g_cur), mode="drop")
            if use_penalties:
                token_counts = token_counts.at[slot_idx, first].add(
                    1, mode="drop")
            if num_logprobs > 0:
                from ..ops.sampling_ops import top_logprobs
                tl_vals, tl_ids = top_logprobs(logits, num_logprobs)
            else:
                tl_vals = tl_ids = jnp.zeros((0,), jnp.int32)
            # host logits-processor path: ship the processed logits rows
            logits_out = logits.astype(jnp.float32) if collect_logits \
                else jnp.zeros((0,), jnp.float32)
            return (new_tokens, logprobs, tl_vals, tl_ids, prev_tokens,
                    token_counts, kv_pages, hidden, g_state, hist,
                    logits_out, moe_counts)

        # kv_pages, prev_tokens, token_counts, g_state, ngram history
        donate = (1, 2, 3, 11, 17)
        return jax.jit(step, donate_argnums=donate)

    # ------------------------------------------------------------------ #
    # Device-resident multi-step decode (the round-2 roofline lever):
    # roll K decode iterations inside ONE jitted scan so each dispatched
    # program emits K tokens per sequence. Per-row stop handling (EOS /
    # stop ids / min_tokens / length budget) runs in-graph; the host
    # fetches once per K tokens. This is the TPU analog of CUDA-graph
    # replay + the overlap loop (reference: cuda_graph_runner.py:84,
    # py_executor.py:2870) taken one step further: the loop itself lives
    # on device, so dispatch/fetch latency amortizes 1/K.
    # ------------------------------------------------------------------ #
    NSTOP = 8  # stop-token ids checked in-graph per row

    def _build_multi_step(self, K: int, Sb: int, use_penalties: bool,
                          all_greedy: bool, use_guided: bool = False,
                          use_ngram: bool = False, use_bias: bool = False,
                          C: int = 0, NC: int = 0):
        """K-step decode window; with C > 0 each scan step ALSO processes
        a host-planned chunk of up to C context-prefill tokens across up
        to NC sequences (+1 filler row absorbing the chunk's padding).

        This is the round-4 wave-structure lever (VERDICT r3 #1): prefill
        compute hides under the decode steps' weight-read bandwidth, so
        refill phases no longer run prefill-only programs while decode
        rows idle (reference role: the overlap loop that never idles the
        device, py_executor.py:2870, and the fused ctx+gen attention op,
        thop/attentionOp.cpp)."""
        model = self.model
        ps, P = self.page_size, self.pages_per_seq
        num_slots_oob = self.num_kv_pages * self.page_size
        base_key = jax.random.PRNGKey(0)
        NSTOP = self.NSTOP

        vswa = self._vswa
        oob_sw = (self.num_sw_pages * ps) if vswa else 0

        def multi_step(params, kv_pages, prev_tokens, token_counts,
                       ints, stop_ids, page_indices, floats, counter,
                       g_state, g_byte, g_mask, g_eos_ok, g_tok_bytes,
                       g_tok_lens, hist, bias_pool, ctx_xs):
            # ints i32[10, Sb]: token_ids, prev_slot, start_pos, out_slots,
            #   top_k, greedy, max_new, stop_gate, row_seeds, ngram_n
            # VSWA engines stack [global, sliding] page tables on axis 0
            # (the dual-pool window — sliding layers address their own
            # pool through the _sw halves, reference:
            # resource_manager.py:1878 pool-per-window-size)
            (token_ids, prev_slot, start_pos, out_slots, top_k, greedy_i,
             max_new, stop_gate, row_seeds, ngram_n) = ints
            page_indices_sw = None
            if vswa:
                page_indices, page_indices_sw = (page_indices[0],
                                                 page_indices[1])
            sampling = SamplingTensors(
                temperature=floats[0], top_k=top_k, top_p=floats[1],
                min_p=floats[2], greedy=greedy_i.astype(bool),
                repetition_penalty=floats[3],
                presence_penalty=floats[4], frequency_penalty=floats[5])
            nslots = prev_tokens.shape[0]
            valid = out_slots >= 0
            iota = jnp.arange(Sb, dtype=jnp.int32)
            cu_q = jnp.arange(Sb + 1, dtype=jnp.int32)
            num_seqs = jnp.full((1,), Sb, jnp.int32)
            key0 = jax.random.fold_in(base_key, counter)

            from_prev = prev_slot >= 0
            first = jnp.where(from_prev,
                              prev_tokens[jnp.clip(prev_slot, 0)], token_ids)
            active0 = valid & (max_new > 0)
            # per-row grammar state rides the scan carry; scattered back
            # to the slot-indexed array once at window end
            gst0 = g_state[jnp.clip(out_slots, 0)] if use_guided else \
                jnp.zeros((Sb,), jnp.int32)
            brow = None
            if use_bias:
                brow = bias_pool[jnp.clip(out_slots, 0)]
                brow = jnp.where(valid[:, None], brow, 0.0)

            def live(carry, x):
                (kv_pages, prev_tokens, token_counts, cur, pos, active,
                 emitted, key, gst, hist) = carry
                kv_len = jnp.where(valid, pos + 1, 1)
                page_row = page_indices[iota, jnp.clip(pos // ps, 0, P - 1)]
                slot_map = jnp.where(active, page_row * ps + pos % ps,
                                     num_slots_oob)
                sm_sw = None
                if vswa:
                    row_sw = page_indices_sw[iota,
                                             jnp.clip(pos // ps, 0, P - 1)]
                    sm_sw = jnp.where(active, row_sw * ps + pos % ps,
                                      oob_sw)
                if C > 0:
                    # context riders: this step's host-planned chunk
                    # (tokens [C], up to NC seqs + 1 filler row) joins the
                    # gen rows in ONE forward — the chunk's matmul FLOPs
                    # hide under the decode weight reads
                    tokens_in = jnp.concatenate([cur, x["tokens"]])
                    pos_in = jnp.concatenate([pos, x["positions"]])
                    slot_in = jnp.concatenate([slot_map, x["slots"]])
                    kv_in = jnp.concatenate([kv_len, x["kv_lens"]])
                    cu_in = jnp.concatenate([cu_q, Sb + x["cu"][1:]])
                    pages_in = jnp.concatenate(
                        [page_indices, x["pages"]], axis=0)
                    seq_slots_in = jnp.concatenate(
                        [out_slots, jnp.full((NC + 1,), -1, jnp.int32)])
                    metadata = AttentionMetadata(
                        kv_lens=kv_in, page_indices=pages_in,
                        cu_q_lens=cu_in,
                        num_seqs=jnp.full((1,), Sb + NC + 1, jnp.int32),
                        slot_mapping=slot_in, positions=pos_in,
                        logits_indices=iota, seq_slots=seq_slots_in)
                    from ..ops.attention import (rpa_decode_blocks,
                                                 rpa_mixed_split)
                    with rpa_mixed_split(Sb), rpa_decode_blocks():
                        logits, kv_pages = model.forward(
                            params, tokens_in, kv_pages, metadata)
                else:
                    metadata = AttentionMetadata(
                        kv_lens=kv_len, page_indices=page_indices,
                        cu_q_lens=cu_q, num_seqs=num_seqs,
                        slot_mapping=slot_map, positions=pos,
                        logits_indices=iota, seq_slots=out_slots,
                        page_indices_sw=page_indices_sw,
                        slot_mapping_sw=sm_sw)
                    from ..ops.attention import rpa_decode_blocks
                    with rpa_decode_blocks():
                        logits, kv_pages = model.forward(
                            params, cur, kv_pages, metadata)
                key = jax.random.fold_in(key, 1)
                g_act = None
                if use_guided:
                    g_act = valid & (gst >= 0)
                    gsc = jnp.clip(gst, 0)
                    mb = g_mask[gsc]
                    bits = (mb[:, :, None] >>
                            jnp.arange(8, dtype=jnp.uint8)) & 1
                    allowed = bits.reshape(Sb, -1)[:, :logits.shape[-1]]
                    allowed = allowed.astype(bool).at[
                        :, self.g_eos_id].set(g_eos_ok[gsc])
                    neg = jnp.asarray(jnp.finfo(jnp.float32).min,
                                      logits.dtype)
                    logits = jnp.where(g_act[:, None] & ~allowed, neg,
                                       logits)
                if use_bias:
                    logits = logits + brow.astype(logits.dtype)
                if use_ngram:
                    # ban over history; the sampled token lands at pos+1
                    from ..ops.sampling_ops import ngram_ban_mask
                    hrows = hist[jnp.clip(out_slots, 0)]
                    ban = ngram_ban_mask(
                        hrows, ngram_n, pos + 1,
                        active & (ngram_n > 0), logits.shape[-1])
                    neg = jnp.asarray(jnp.finfo(jnp.float32).min,
                                      logits.dtype)
                    logits = jnp.where(ban, neg, logits)
                if use_penalties:
                    counts_rows = token_counts[jnp.clip(out_slots, 0)]
                else:
                    counts_rows = None
                if all_greedy and not use_penalties:
                    lf = logits.astype(jnp.float32)
                    tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)
                    logz = jax.nn.logsumexp(lf, axis=-1)
                    chosen = jnp.take_along_axis(
                        lf, tok[:, None], axis=-1)[:, 0]
                    lp = chosen - logz
                else:
                    tok, lp = sample(logits, sampling, key,
                                     token_counts=counts_rows,
                                     row_seeds=(row_seeds, kv_len))
                emit = active
                new_emitted = emitted + emit.astype(jnp.int32)
                # stop ids (end_id folded into the list host-side);
                # pads are -1 and can never match a sampled token
                hit_stop = jnp.any(tok[:, None] == stop_ids, axis=1)
                stopped = hit_stop & (new_emitted >= stop_gate)
                len_done = new_emitted >= max_new
                nxt_active = active & ~stopped & ~len_done
                slot_idx = jnp.where(emit, out_slots, nslots)
                prev_tokens = prev_tokens.at[slot_idx].set(tok, mode="drop")
                if use_penalties:
                    token_counts = token_counts.at[slot_idx, tok].add(
                        1, mode="drop")
                if use_ngram:
                    Lh = hist.shape[1]
                    wrow = jnp.where(emit & (pos + 1 < Lh), out_slots,
                                     nslots)
                    hist = hist.at[wrow, jnp.clip(pos + 1, 0, Lh - 1)].set(
                        tok, mode="drop")
                if use_guided:
                    fb = g_tok_bytes[tok].astype(jnp.int32)    # [Sb, L]
                    flen = g_tok_lens[tok]

                    def walk(j, st):
                        nxt = g_byte[jnp.clip(st, 0),
                                     fb[:, j]].astype(jnp.int32)
                        return jnp.where((j < flen) & (st >= 0), nxt, st)
                    ns = jax.lax.fori_loop(0, fb.shape[1], walk,
                                           gst.astype(jnp.int32))
                    ns = jnp.where(tok == self.g_eos_id, gst, ns)
                    gst = jnp.where(emit & g_act, ns, gst)
                pos = pos + emit.astype(jnp.int32)
                return ((kv_pages, prev_tokens, token_counts, tok, pos,
                         nxt_active, new_emitted, key, gst, hist),
                        (tok, lp))

            def dead(carry, x):
                return carry, (jnp.zeros((Sb,), jnp.int32),
                               jnp.zeros((Sb,), jnp.float32))

            def body(carry, x):
                # skip the model call once every row has finished (but a
                # step still carrying context-chunk work must run)
                run = jnp.any(carry[5])
                if C > 0:
                    run = run | (x["cu"][NC] > 0)
                return jax.lax.cond(run, lambda op: live(*op),
                                    lambda op: dead(*op), (carry, x))

            carry0 = (kv_pages, prev_tokens, token_counts, first, start_pos,
                      active0, jnp.zeros((Sb,), jnp.int32), key0, gst0,
                      hist)
            carry, (toks, lps) = jax.lax.scan(body, carry0, ctx_xs,
                                              length=K if C == 0 else None)
            (kv_pages, prev_tokens, token_counts, _, _, _, emitted,
             _, gst, hist) = carry
            if use_guided:
                g_state = g_state.at[
                    jnp.where(valid & (gst0 >= 0), out_slots,
                              prev_tokens.shape[0])].set(gst, mode="drop")
            return (toks, lps, emitted, prev_tokens, token_counts, kv_pages,
                    g_state, hist)

        return jax.jit(multi_step, donate_argnums=(1, 2, 3, 9, 15))

    def _get_multi_step_fn(self, K: int, Sb: int, use_penalties: bool,
                           all_greedy: bool, use_guided: bool = False,
                           use_ngram: bool = False, use_bias: bool = False,
                           C: int = 0, NC: int = 0):
        key = ("multi", K, Sb, use_penalties, all_greedy, use_guided,
               use_ngram, use_bias, C, NC)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_multi_step(
                K, Sb, use_penalties, all_greedy, use_guided, use_ngram,
                use_bias, C, NC)
        return self._step_fns[key]

    # ------------------------------------------------------------------ #
    # Context-chunk planning for the mixed decode window
    # ------------------------------------------------------------------ #
    @property
    def mixed_ctx_tokens(self) -> int:
        """C: context tokens carried per window step (0 = disabled)."""
        return int(getattr(self.args, "mixed_window_ctx", 0) or 0)

    @property
    def mixed_ctx_seqs(self) -> int:
        C = self.mixed_ctx_tokens
        return max(2, min(16, C // 64)) if C else 0

    def plan_ctx_chunks(self, ctx_requests, K: int):
        """Carve the scheduled context requests' chunk ranges into K
        per-step rider chunks (host, numpy). Returns (xs dict with
        leading K axis, carved token count per request)."""
        C, NC = self.mixed_ctx_tokens, self.mixed_ctx_seqs
        ps, P = self.page_size, self.pages_per_seq
        oob = self.num_kv_pages * ps
        tok = np.zeros((K, C), np.int32)
        pos = np.zeros((K, C), np.int32)
        slot = np.full((K, C), oob, np.int32)
        kvl = np.ones((K, NC + 1), np.int32)
        cu = np.zeros((K, NC + 2), np.int32)
        pages = np.zeros((K, NC + 1, P), np.int32)
        carved = [0] * len(ctx_requests)
        offs = [r.context_current_position for r in ctx_requests]
        ends = [min(r.context_len,
                    r.context_current_position + r.context_chunk_size)
                for r in ctx_requests]
        ri = 0
        for k in range(K):
            used, row = 0, 0
            while ri < len(ctx_requests) and used < C and row < NC:
                r = ctx_requests[ri]
                take = min(ends[ri] - offs[ri], C - used)
                if take <= 0:
                    ri += 1
                    continue
                s, e = offs[ri], offs[ri] + take
                blk = np.asarray(r.kv_block_ids, np.int32)
                ppos = np.arange(s, e, dtype=np.int32)
                tok[k, used:used + take] = r.context_token_ids[s:e]
                pos[k, used:used + take] = ppos
                slot[k, used:used + take] = blk[ppos // ps] * ps + ppos % ps
                pages[k, row, :len(blk)] = blk
                kvl[k, row] = e
                cu[k, row + 1] = used + take
                used += take
                row += 1
                offs[ri] += take
                carved[ri] += take
                if offs[ri] >= ends[ri]:
                    ri += 1
            for rr in range(row, NC):
                cu[k, rr + 1] = used
            cu[k, NC + 1] = C
            # filler row self-attends over the pad region (garbage in,
            # output discarded; KV writes routed out of bounds)
            kvl[k, NC] = max(1, C - used)
            pos[k, used:] = np.arange(C - used, dtype=np.int32)
        xs = dict(tokens=jnp.asarray(tok), positions=jnp.asarray(pos),
                  slots=jnp.asarray(slot), kv_lens=jnp.asarray(kvl),
                  cu=jnp.asarray(cu), pages=jnp.asarray(pages))
        return xs, carved

    def _pick_row_bucket(self, n: int) -> int:
        for b in self.row_buckets:
            if n <= b:
                return b
        raise ValueError(f"{n} rows exceeds max_batch_size")

    @functools.cached_property
    def row_buckets(self) -> List[int]:
        S = self.max_batch_size
        return sorted({b for b in self.token_buckets if b < S} | {S})

    def forward_multi_step(self, batch: ScheduledRequests, K: int,
                           use_penalties: bool = False,
                           ctx_requests=None):
        """Launch one K-step decode window for a generation-only batch.
        Each request must carry ``multi_step_budget`` (set by the
        executor after KV pre-allocation). Returns device futures
        (tokens [K, Sb], logprobs [K, Sb], emitted [Sb]).

        With ``ctx_requests`` (mixed window), each step also prefills a
        planned context chunk; returns an extra ``carved`` list of
        context tokens consumed per ctx request."""
        reqs = batch.generation_requests
        n = len(reqs)
        Sb = self._pick_row_bucket(n)
        P = self.pages_per_seq
        NSTOP = self.NSTOP
        self.iter_counter += 1

        ints = np.zeros((10, Sb), np.int32)
        ints[1] = -1   # prev_slot
        ints[3] = -1   # out_slots (pad rows scatter out of bounds)
        stop_ids = np.full((Sb, NSTOP), -1, np.int32)
        floats = np.zeros((6, Sb), np.float32)
        floats[0] = 1.0
        floats[1] = 1.0
        floats[3] = 1.0
        page_indices = np.zeros((Sb, P), np.int32)
        page_indices_sw = np.zeros((Sb, P), np.int32) if self._vswa \
            else None
        all_greedy = True
        for i, r in enumerate(reqs):
            sp = r.sampling_params
            ndt = r.num_device_tokens
            if r.host_token_override is not None:
                ints[0, i] = r.host_token_override
            else:
                ints[1, i] = r.seq_slot
            ints[2, i] = ndt
            ints[3, i] = r.seq_slot
            ints[4, i] = sp.top_k
            ints[5, i] = int(sp.greedy)
            outs = ndt - r.prompt_len
            ints[6, i] = r.multi_step_budget
            ints[7, i] = max(0, sp.min_tokens - outs)
            if sp.seed:
                ints[8, i] = sp.seed & 0x7FFFFFFF or 1
            ids = list(sp.stop_id_list())[:NSTOP]
            stop_ids[i, :len(ids)] = ids
            blocks = r.kv_block_ids
            page_indices[i, :len(blocks)] = blocks
            if self._vswa:
                bs = getattr(r, "kv_block_ids_sw", [])
                page_indices_sw[i, :len(bs)] = bs
            all_greedy &= sp.greedy
            ints[9, i] = min(sp.no_repeat_ngram_size, 8)
            floats[0, i] = max(sp.temperature, 1e-5)
            floats[1, i] = sp.top_p
            floats[2, i] = sp.min_p
            floats[3, i] = sp.repetition_penalty
            floats[4, i] = sp.presence_penalty
            floats[5, i] = sp.frequency_penalty
        counts = getattr(self, "token_counts", None)
        if use_penalties and counts is None:
            counts = jnp.zeros((self.max_batch_size, self.model.vocab_size),
                               jnp.int32)
        use_guided = self.g_enabled and any(
            r.sampling_params.guided_decoding is not None for r in reqs)
        use_ngram = bool(ints[9].any()) and self.ngram_history is not None
        use_bias = self.bias_pool is not None and any(
            r.sampling_params.embedding_bias is not None for r in reqs)
        ctx_xs, carved = None, None
        C = NCx = 0
        if ctx_requests:
            C, NCx = self.mixed_ctx_tokens, self.mixed_ctx_seqs
            ctx_xs, carved = self.plan_ctx_chunks(ctx_requests, K)
            self.mixed_windows_dispatched = getattr(
                self, "mixed_windows_dispatched", 0) + 1
            self.mixed_ctx_carved = getattr(
                self, "mixed_ctx_carved", 0) + sum(carved)
        fn = self._get_multi_step_fn(K, Sb, use_penalties, all_greedy,
                                     use_guided, use_ngram, use_bias,
                                     C, NCx)
        pages_arg = np.stack([page_indices, page_indices_sw]) \
            if self._vswa else page_indices
        out = fn(self.params, self.kv_pages, self.prev_tokens,
                 counts if use_penalties else jnp.zeros((1, 1), jnp.int32),
                 jnp.asarray(ints), jnp.asarray(stop_ids),
                 jnp.asarray(pages_arg), jnp.asarray(floats),
                 self.iter_counter, *self._guided_args(use_guided),
                 *self._aux_args(use_ngram, use_bias), ctx_xs)
        (tokens, logprobs, emitted, self.prev_tokens, new_counts,
         self.kv_pages, g_state, hist) = out
        if use_guided:
            self.g_state = g_state
        if use_ngram:
            self.ngram_history = hist
        if use_penalties:
            self.token_counts = new_counts
        if ctx_requests:
            return tokens, logprobs, emitted, carved
        return tokens, logprobs, emitted

    def forward_spec_window(self, batch: ScheduledRequests):
        """Fused speculative decode window (runtime/spec_window.py)."""
        from .spec_window import forward_spec_window
        return forward_spec_window(self, batch)

    def spec_seed(self, tokens, hidden, rows, slots, positions,
                  emitted) -> None:
        from .spec_window import spec_seed
        spec_seed(self, tokens, hidden, rows, slots, positions, emitted)

    def _guided_args(self, use_guided: bool):
        """The six device-guided jit operands (dummies when unused so the
        arity is stable; the step fns never touch the dummies)."""
        if use_guided:
            return (self.g_state, self.g_byte_table, self.g_mask_bits,
                    self.g_eos_ok, self.g_token_bytes, self.g_token_lens)
        z1 = jnp.zeros((1,), jnp.int32)
        return (z1, jnp.zeros((1, 1), jnp.int16),
                jnp.zeros((1, 1), jnp.uint8), jnp.zeros((1,), bool),
                jnp.zeros((1, 1), jnp.uint8), z1)

    def _get_step_fn(self, use_penalties: bool, use_mask: bool = False,
                     all_greedy: bool = False, num_logprobs: int = 0,
                     use_embeds: bool = False, use_lora: bool = False,
                     use_hidden: bool = False, use_tree: bool = False,
                     use_guided: bool = False, use_ngram: bool = False,
                     use_bias: bool = False, collect_logits: bool = False):
        key = (use_penalties, use_mask, all_greedy, num_logprobs,
               use_embeds, use_lora, use_hidden, use_tree, use_guided,
               use_ngram, use_bias, collect_logits)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step(
                use_penalties, use_mask, all_greedy, num_logprobs,
                use_embeds, use_lora, use_hidden, use_tree, use_guided,
                use_ngram, use_bias, collect_logits)
        return self._step_fns[key]

    def calibrate_kv_scales(self, token_ids: np.ndarray) -> Optional[np.ndarray]:
        """Set per-layer KV quant scales from one prefill pass over
        calibration tokens (absmax of the fresh K/V projections; the
        reference plumbs ModelOpt-calibrated kv_scale_orig_quant,
        attentionOp.cpp:919 — this replaces the hardcoded default when a
        checkpoint ships no scales). Runs at engine build before any
        request owns KV pages, so the scratch writes are harmless."""
        layers = self.params.get("layers") \
            if isinstance(self.params, dict) else None
        if layers is None or "kv_scale" not in layers:
            return None
        if not self.model.config.uses_kv_quant:
            return None
        ps = self.page_size
        T = int(min(len(token_ids), self.args.max_num_tokens,
                    (self.num_kv_pages - 1) * ps, self.max_seq_len))
        tokens = np.asarray(token_ids[:T], np.int32)
        n_pages = -(-T // ps)
        metadata = AttentionMetadata(
            kv_lens=jnp.asarray([T], jnp.int32),
            page_indices=jnp.arange(n_pages, dtype=jnp.int32)[None, :],
            cu_q_lens=jnp.asarray([0, T], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
            slot_mapping=jnp.arange(T, dtype=jnp.int32),
            positions=jnp.arange(T, dtype=jnp.int32),
            logits_indices=jnp.asarray([T - 1], jnp.int32),
            seq_slots=jnp.asarray([0], jnp.int32))
        fwd = jax.jit(functools.partial(self.model.forward,
                                        collect_kv_stats=True))
        _, self.kv_pages, stats = fwd(self.params, jnp.asarray(tokens),
                                      self.kv_pages, metadata)
        qmax = 127.0 if self.model.config.kv_cache_dtype == jnp.int8 \
            else 448.0
        scales = np.maximum(np.asarray(stats, np.float32) / qmax, 1e-6)
        old = layers["kv_scale"]
        layers["kv_scale"] = jax.device_put(
            jnp.asarray(scales, jnp.float32), old.sharding)
        logger.info("calibrated KV scales over %d tokens: "
                    "min=%.4g max=%.4g", T, scales.min(), scales.max())
        return scales

    def rebalance_moe(self, expert_loads) -> None:
        """Wide-EP rebalance (reference: MoeLoadBalancer +
        fused_moe_wide_ep.py + moeLoadBalancer.cpp background
        redistribution): recompute the EPLB placement from observed
        per-expert loads and install replica-slot weight tables; hot
        experts replicate across the ep shards. One GSPMD gather per
        MoE weight — called by the executor's MoeLoadTracker on skew,
        or manually via LLM.rebalance_moe."""
        from ..ops.moe_balancer import build_replica_tables, eplb_placement
        layers = self.params.get("layers", {})
        if "w_gate" not in layers:
            raise ValueError("model has no MoE expert weights")
        loads = np.asarray(expert_loads, np.float64)
        if loads.ndim == 2:          # [L, E] iteration counts → totals
            loads = loads.sum(axis=0)
        E = layers["w_gate"].shape[1]
        nshards = max(1, self.mapping.cp_size * self.mapping.tp_size)
        num_slots = max(E, nshards * (-(-E // nshards)))
        num_slots = max(num_slots, 2 * nshards * (num_slots // nshards)
                        // 2)
        placement = eplb_placement(loads, num_slots=num_slots,
                                   num_shards=nshards)
        rep_count, rep_slots = build_replica_tables(placement, E)
        pl = jnp.asarray(placement)
        gather = jax.jit(lambda w: w[:, pl])
        new = dict(layers)
        new["w_gate_slots"] = gather(layers["w_gate"])
        new["w_up_slots"] = gather(layers["w_up"])
        new["w_down_slots"] = gather(layers["w_down"])
        # layer entries ride the scan (sliced on the leading L dim):
        # broadcast the shared placement tables per layer
        L = layers["w_gate"].shape[0]
        new["moe_rep_count"] = jnp.tile(
            jnp.asarray(rep_count)[None], (L, 1))
        new["moe_rep_slots"] = jnp.tile(
            jnp.asarray(rep_slots)[None], (L, 1, 1))
        self.params = {**self.params, "layers": new}
        self.moe_placement = placement
        logger.info("wide-EP rebalance: %d slots over %d shards, max "
                    "replicas %d", num_slots, nshards,
                    int(rep_count.max()))

    def reset_slot_counts(self, slots: List[int]) -> None:
        """Zero the penalty token-count rows for newly admitted slots so a
        recycled slot can't leak the previous request's token history."""
        counts = getattr(self, "token_counts", None)
        if counts is None or not slots:
            return
        idx = jnp.asarray(slots, jnp.int32)
        self.token_counts = counts.at[idx].set(0)

    # ------------------------------------------------------------------ #
    # LoRA (reference: peftCacheManager + loraOp)
    # ------------------------------------------------------------------ #
    def set_lora_manager(self, manager) -> None:
        self.lora_manager = manager

    def refresh_lora(self) -> None:
        """Re-upload the stacked adapter tensors after (de)activation."""
        import jax as _jax
        stacks = self.lora_manager.device_stacks(
            self.model.lora_module_shapes(), self.model.dtype)
        self.lora_params = _jax.device_put(stacks)

    # ------------------------------------------------------------------ #
    # Input preparation (host, numpy)
    # ------------------------------------------------------------------ #
    def prepare_inputs(self, batch: ScheduledRequests) -> StepInputs:
        """Flatten the scheduled batch into ragged arrays
        (reference: model_engine._prepare_tp_inputs:2347)."""
        S, P, ps = self.max_batch_size, self.pages_per_seq, self.page_size
        G = self.max_draft_len + 1
        reqs = batch.context_requests + batch.generation_requests
        assert len(reqs) <= S, f"{len(reqs)} > max_batch_size {S}"

        tok_list: List[int] = []
        prev_list: List[int] = []
        pos_list: List[int] = []
        slot_map: List[int] = []
        lora_list: List[int] = []
        kv_lens = np.zeros(S, np.int32)
        page_indices = np.zeros((S, P), np.int32)
        page_indices_sw = np.zeros((S, P), np.int32) if self._vswa else None
        slot_map_sw: List[int] = []
        cu_q = np.zeros(S + 1, np.int32)
        logits_idx = np.zeros(S * G, np.int32)
        out_slots = np.full(S, -1, np.int32)
        tree_rows: List[Tuple[int, List[int]]] = []

        for i, req in enumerate(reqs):
            blocks = req.kv_block_ids
            page_indices[i, :len(blocks)] = blocks
            if self._vswa:
                blocks_sw = getattr(req, "kv_block_ids_sw", [])
                page_indices_sw[i, :len(blocks_sw)] = blocks_sw
            lslot = -1
            if self.lora_manager is not None and req.lora_task_id is not None:
                lslot = self.lora_manager.slot_for(req.lora_task_id)
            last_chunk_row = True
            if req.is_context_init_state:
                start = req.context_current_position
                end = min(req.context_len, start + req.context_chunk_size)
                last_chunk_row = end >= req.context_len
                chunk = req.context_token_ids[start:end]
                tok_list.extend(chunk)
                prev_list.extend([-1] * len(chunk))
                pos_list.extend(range(start, end))
                for p in range(start, end):
                    slot_map.append(blocks[p // ps] * ps + p % ps)
                if self._vswa:
                    bs = getattr(req, "kv_block_ids_sw", [])
                    for p in range(start, end):
                        slot_map_sw.append(bs[p // ps] * ps + p % ps)
                lora_list.extend([lslot] * len(chunk))
                kv_lens[i] = end
                logits_idx[i * G:(i + 1) * G] = len(tok_list) - 1
            else:
                # generation: first token comes from prev_tokens[slot]
                # (device, overlap mode) or the host (sync mode); draft
                # tokens (speculative) ride behind it
                pos = req.num_device_tokens
                if req.host_token_override is not None:
                    tok_list.append(req.host_token_override)
                    prev_list.append(-1)
                else:
                    tok_list.append(0)
                    prev_list.append(req.seq_slot)
                pos_list.append(pos)
                slot_map.append(blocks[pos // ps] * ps + pos % ps)
                if self._vswa:
                    bs = getattr(req, "kv_block_ids_sw", [])
                    slot_map_sw.append(bs[pos // ps] * ps + pos % ps)
                drafts = req.draft_tokens[:self.max_draft_len]
                parents = getattr(req, "draft_parents", None)
                if parents is not None:
                    parents = list(parents)[:len(drafts)]
                    depth, masks = [], []
                    for j in range(len(drafts)):
                        pj = parents[j]
                        depth.append(1 if pj < 0 else depth[pj] + 1)
                        masks.append((1 << j) if pj < 0
                                     else masks[pj] | (1 << j))
                    tree_rows.append((len(tok_list), masks, True))
                elif drafts:
                    # chain drafts get degenerate prefix masks so they
                    # stay correct if a TREE request shares the batch
                    tree_rows.append(
                        (len(tok_list),
                         [(1 << (j + 1)) - 1 for j in range(len(drafts))],
                         False))
                for j, d in enumerate(drafts):
                    tok_list.append(d)
                    prev_list.append(-1)
                    # kv SLOT is node-indexed (each branch its own slot);
                    # the rope POSITION is depth-based for trees
                    sidx = pos + 1 + j
                    p = sidx if parents is None else pos + depth[j]
                    pos_list.append(p)
                    slot_map.append(blocks[sidx // ps] * ps + sidx % ps)
                    if self._vswa:
                        slot_map_sw.append(bs[sidx // ps] * ps
                                           + sidx % ps)
                lora_list.extend([lslot] * (1 + len(drafts)))
                kv_lens[i] = pos + 1 + len(drafts)
                # one logits row per fed token; pad by repeating the last
                base = len(tok_list) - (1 + len(drafts))
                for g in range(G):
                    logits_idx[i * G + g] = base + min(g, len(drafts))
            cu_q[i + 1] = len(tok_list)
            # mid-chunk context rows produce no real sample: route their
            # scatter out of bounds so junk tokens can't pollute
            # prev_tokens / token_counts for the slot
            if req.is_context_init_state and not last_chunk_row:
                out_slots[i] = -1
            else:
                out_slots[i] = req.seq_slot
        cu_q[len(reqs) + 1:] = len(tok_list)

        tree_masks = None
        if any(is_tree for _, _, is_tree in tree_rows):
            tree_masks = np.zeros(len(tok_list), np.int32)
            for row0, masks, _ in tree_rows:
                tree_masks[row0:row0 + len(masks)] = masks
        mm_groups = None
        if self._mmg:
            mm_groups = np.full(len(pos_list), -1, np.int32)
            for i, req in enumerate(reqs):
                gi = getattr(req, "mm_group_ids", None)
                if gi is None:
                    continue
                for t in range(cu_q[i], cu_q[i + 1]):
                    p = pos_list[t]
                    if p < len(gi):
                        mm_groups[t] = gi[p]
        positions_mrope = None
        if self._mrope:
            # per-token 3-axis rope positions: multimodal prompts carry
            # a precomputed [3, prompt_len] grid (reference:
            # Qwen2-VL get_rope_index); past it, all axes advance
            # together from the request's delta
            positions_mrope = np.zeros((3, len(pos_list)), np.int32)
            for i, req in enumerate(reqs):
                mp = getattr(req, "mrope_positions", None)
                delta = int(getattr(req, "mrope_delta", 0) or 0)
                for t in range(cu_q[i], cu_q[i + 1]):
                    p = pos_list[t]
                    if mp is not None and p < mp.shape[1]:
                        positions_mrope[:, t] = mp[:, p]
                    else:
                        positions_mrope[:, t] = p + delta

        return StepInputs(
            token_ids=np.asarray(tok_list, np.int32),
            prev_slot=np.asarray(prev_list, np.int32),
            positions=np.asarray(pos_list, np.int32),
            kv_lens=kv_lens, page_indices=page_indices, cu_q_lens=cu_q,
            num_seqs=np.asarray([len(reqs)], np.int32),
            slot_mapping=np.asarray(slot_map, np.int32),
            lora_slots=np.asarray(lora_list, np.int32),
            logits_indices=logits_idx, out_slots=out_slots,
            num_tokens=len(tok_list), num_reqs=len(reqs),
            page_indices_sw=page_indices_sw,
            slot_mapping_sw=(np.asarray(slot_map_sw, np.int32)
                             if self._vswa else None),
            positions_mrope=positions_mrope, mm_groups=mm_groups,
            tree_masks=tree_masks)

    # ------------------------------------------------------------------ #
    def set_cross_state(self, slot: int, cross_states) -> None:
        """Cross-attention VLM admission: compute the request's
        per-layer vision K/V (model.compute_cross_kv) and write them
        into the slot-indexed cross cache (reference: mllama cross-KV
        prefill)."""
        ks, vs = self.model.compute_cross_kv(self.params, cross_states)
        n = ks.shape[1]
        kvp = dict(self.kv_pages)
        kvp["cross_k"] = kvp["cross_k"].at[:, slot, :n].set(
            ks.astype(kvp["cross_k"].dtype))
        kvp["cross_v"] = kvp["cross_v"].at[:, slot, :n].set(
            vs.astype(kvp["cross_v"].dtype))
        kvp["cross_len"] = kvp["cross_len"].at[slot].set(n)
        self.kv_pages = kvp

    def clear_cross_state(self, slot: int) -> None:
        kvp = dict(self.kv_pages)
        kvp["cross_len"] = kvp["cross_len"].at[slot].set(0)
        self.kv_pages = kvp

    def fix_tree_kv(self, src_slots, dst_slots) -> None:
        """Tree-draft KV compaction: accepted tree nodes were written at
        node-indexed kv slots; move them to their committed POSITIONAL
        slots (reference role: the tree-acceptance KV rewind kernels in
        speculativeDecoding/). dst <= src always, so gather-then-scatter
        in one program is safe."""
        import jax as _jax
        K = self.max_draft_len
        oob = self.num_kv_pages * self.page_size
        src = np.full(K, 0, np.int32)
        dst = np.full(K, oob, np.int32)
        n = len(src_slots)
        src[:n] = src_slots
        dst[:n] = dst_slots
        if self._fix_kv_fn is None:
            def fix(kv, s, d):
                L = kv.shape[0]
                flat = kv.reshape(L, -1, *kv.shape[3:])
                rows = flat[:, s]
                flat = flat.at[:, d].set(rows, mode="drop")
                return flat.reshape(kv.shape)
            self._fix_kv_fn = _jax.jit(fix, donate_argnums=(0,))
        self.kv_pages = self._fix_kv_fn(self.kv_pages, jnp.asarray(src),
                                        jnp.asarray(dst))

    # ------------------------------------------------------------------ #
    # Sleep / wake (RL-style weight offload) + live weight update
    # (reference: SleepConfig llm_args.py:2005, virtualMemory.cpp;
    # /release_memory /resume_memory /update_weights endpoints)
    # ------------------------------------------------------------------ #
    def release_weights(self) -> None:
        """Move params to host and free device HBM (sleep)."""
        if getattr(self, "_host_params", None) is not None:
            return
        self._host_params = jax.device_get(self.params)
        self.params = None
        self.kv_pages = None  # KV is invalidated by sleep

    def resume_weights(self) -> None:
        """Re-upload params and reallocate KV pools (wake)."""
        if getattr(self, "_host_params", None) is None:
            return
        self.params = self._shard_params(self._host_params)
        self._host_params = None
        self.kv_pages = self._make_kv_pages()
        self.prev_tokens = jnp.zeros((self.max_batch_size,), jnp.int32)

    def update_weights(self, state_dict: Dict[str, np.ndarray]) -> None:
        """RLHF hot-swap: re-ingest a full HF state dict in place
        (reference: llmapi/rlhf_utils.py)."""
        params = self.model.load_hf_state_dict(state_dict)
        self.params = self._shard_params(params)

    # ------------------------------------------------------------------ #
    # Warmup: pre-compile every token bucket (the reference's
    # model_engine.warmup + CUDA-graph capture, model_engine.py:798 —
    # a single mid-run compile costs seconds and wrecks tail latency)
    # ------------------------------------------------------------------ #
    def warmup(self) -> None:
        S, G = self.max_batch_size, self.max_draft_len + 1
        ps = self.page_size
        num_slots = self.num_kv_pages * self.page_size
        # warm the greedy variant (the common serving path); the sampling
        # variant compiles on first non-greedy request
        step_fn = self._get_step_fn(False, False, True)
        last = None
        for T in self.token_buckets:
            # spread T fake tokens over enough fake seqs that each stays
            # within one page (reads page 0; writes are dropped)
            n_seqs = min(S, -(-T // ps))
            per = -(-T // n_seqs)
            # must match launch()'s row count exactly or the warmup
            # compile lands in a different (never-used) shape signature
            ints_t = np.zeros(((6 if self._vswa else 5)
                               + (3 if self._mrope else 0)
                               + (1 if self._mmg else 0), T), np.int32)
            ints_t[1] = -1
            ints_t[3] = num_slots
            if self._vswa:
                ints_t[5] = self.num_sw_pages * self.page_size
            kv_lens = np.zeros(S, np.int32)
            cu = np.zeros(S + 1, np.int32)
            pos = 0
            for i in range(n_seqs):
                q = min(per, T - pos)
                kv_lens[i] = max(q, 1)
                pos += q
                cu[i + 1] = pos
            cu[n_seqs + 1:] = pos
            ints_s = np.concatenate([
                kv_lens, cu, np.zeros(S * G, np.int32),
                np.full(S, -1, np.int32), np.zeros(S, np.int32),
                np.ones(S, np.int32), np.asarray([n_seqs], np.int32),
                np.asarray([0], np.int32), np.zeros(S, np.int32),
                np.full(S * G, -1, np.int32), np.zeros(S, np.int32)])
            page_indices = np.zeros((S, self.pages_per_seq), np.int32)
            if self._vswa:
                page_indices = np.stack([page_indices, page_indices])
            floats = np.ones((6, S), np.float32)
            out = step_fn(self.params, self.kv_pages, self.prev_tokens,
                          jnp.zeros((1, 1), jnp.int32),
                          jnp.asarray(ints_t), jnp.asarray(ints_s),
                          jnp.asarray(page_indices), jnp.asarray(floats),
                          jnp.zeros((1, 1), bool),
                          jnp.zeros((1, 1), jnp.float32), 0,
                          *self._guided_args(False),
                          *self._aux_args(False, False))
            (_, _, _, _, self.prev_tokens, _, self.kv_pages, _, _, _,
             _, _) = out
            last = out[0]
            logger.info("warmed bucket T=%d", T)
        if last is not None:
            jax.block_until_ready(last)
        # warm the multi-step decode windows (greedy variant) for every
        # row bucket; all rows are marked inactive so the scan takes the
        # skip branch and no device state is disturbed
        K = getattr(self.args, "decode_multi_step", 1)
        if K > 1:
            mixed_variants = [(0, 0)]
            if self.mixed_ctx_tokens > 0:
                mixed_variants.append(
                    (self.mixed_ctx_tokens, self.mixed_ctx_seqs))
            for Sb in self.row_buckets:
                for Cw, NCw in mixed_variants:
                    self._warm_multi(K, Sb, Cw, NCw)
            jax.block_until_ready(self.kv_pages)
        # reset device-side token state touched by the fake steps
        self.prev_tokens = jnp.zeros((self.max_batch_size,), jnp.int32)

    def _warm_multi(self, K: int, Sb: int, Cw: int, NCw: int) -> None:
        """Warm one multi-step window variant (all rows inactive and an
        empty rider chunk: the scan takes the skip branch, so no device
        state is disturbed while the full program still compiles)."""
        fn = self._get_multi_step_fn(K, Sb, False, True, C=Cw, NC=NCw)
        ints = np.zeros((10, Sb), np.int32)
        ints[1] = -1
        ints[3] = -1  # invalid rows -> inactive
        ctx_xs = None
        if Cw > 0:
            P = self.pages_per_seq
            oob = self.num_kv_pages * self.page_size
            cu = np.zeros((K, NCw + 2), np.int32)
            cu[:, NCw + 1] = Cw
            pos = np.tile(np.arange(Cw, dtype=np.int32), (K, 1))
            kvl = np.ones((K, NCw + 1), np.int32)
            kvl[:, NCw] = Cw    # filler self-attends over the pad region
            ctx_xs = dict(
                tokens=jnp.zeros((K, Cw), jnp.int32),
                positions=jnp.asarray(pos),
                slots=jnp.full((K, Cw), oob, jnp.int32),
                kv_lens=jnp.asarray(kvl),
                cu=jnp.asarray(cu),
                pages=jnp.zeros((K, NCw + 1, P), jnp.int32))
        pshape = (Sb, self.pages_per_seq)
        if self._vswa:
            pshape = (2,) + pshape
        out = fn(self.params, self.kv_pages, self.prev_tokens,
                 jnp.zeros((1, 1), jnp.int32), jnp.asarray(ints),
                 jnp.full((Sb, self.NSTOP), -1, jnp.int32),
                 jnp.zeros(pshape, jnp.int32),
                 jnp.ones((6, Sb), jnp.float32), 0,
                 *self._guided_args(False),
                 *self._aux_args(False, False), ctx_xs)
        (_, _, _, self.prev_tokens, _, self.kv_pages, _, _) = out
        logger.info("warmed multi-step window K=%d rows=%d ctx=%d",
                    K, Sb, Cw)

    # ------------------------------------------------------------------ #
    # Disaggregated serving: KV extraction/injection (the CacheTransceiver
    # data path; reference: batch_manager/cacheTransceiver.cpp +
    # cacheFormatter.cpp layout conversion)
    # ------------------------------------------------------------------ #
    def extract_kv(self, block_ids: List[int], num_tokens: int) -> np.ndarray:
        """Gather a request's KV into a contiguous host array
        [L, num_tokens, 2*kv_heads, head_dim]."""
        ids = jnp.asarray(block_ids, jnp.int32)
        gathered = self._extract_fn(self.kv_pages, ids)
        flat = np.asarray(gathered)      # [L, n_blocks*ps, 2kvh, hd]
        return flat[:, :num_tokens]

    @functools.cached_property
    def _extract_fn(self):
        ps = self.page_size

        @jax.jit
        def fn(kv_pages, ids):
            g = kv_pages[:, ids]          # [L, n, ps, c, hd]
            L, n, _, c, hd = g.shape
            return g.reshape(L, n * ps, c, hd)
        return fn

    def inject_kv(self, block_ids: List[int], kv_host: np.ndarray) -> None:
        """Scatter a contiguous KV blob into this engine's pages."""
        num_tokens = kv_host.shape[1]
        ps = self.page_size
        pad = -num_tokens % ps
        if pad:
            kv_host = np.pad(kv_host, ((0, 0), (0, pad), (0, 0), (0, 0)))
        n = kv_host.shape[1] // ps
        blob = kv_host.reshape(kv_host.shape[0], n, ps, *kv_host.shape[2:])
        ids = jnp.asarray(block_ids[:n], jnp.int32)
        self.kv_pages = self._inject_fn(
            self.kv_pages, jnp.asarray(blob,
                                       self.model.config.kv_cache_dtype), ids)

    @functools.cached_property
    def _inject_fn(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fn(kv_pages, blob, ids):
            return kv_pages.at[:, ids].set(blob)
        return fn

    # single-page movers for the host KV tier (evictionPolicy secondary
    # offload; KvCacheConfig.host_cache_size)
    def offload_page(self, block_id: int) -> np.ndarray:
        return np.asarray(self._page_gather_fn(
            self.kv_pages, jnp.asarray(block_id, jnp.int32)))

    def onboard_page(self, block_id: int, data: np.ndarray) -> None:
        self.kv_pages = self._page_scatter_fn(
            self.kv_pages,
            jnp.asarray(data, self.model.config.kv_cache_dtype),
            jnp.asarray(block_id, jnp.int32))

    @functools.cached_property
    def _page_gather_fn(self):
        @jax.jit
        def fn(kv_pages, bid):
            return kv_pages[:, bid]   # [L, ps, 2kvh, hd]
        return fn

    @functools.cached_property
    def _page_scatter_fn(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fn(kv_pages, page, bid):
            return kv_pages.at[:, bid].set(page)
        return fn

    def copy_page(self, src_block: int, dst_block: int) -> None:
        """Device-side page copy (beam fork; the cache_indirection analog)."""
        self.kv_pages = self._page_copy_fn(
            self.kv_pages, jnp.asarray(src_block, jnp.int32),
            jnp.asarray(dst_block, jnp.int32))

    @functools.cached_property
    def _page_copy_fn(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fn(kv_pages, src, dst):
            return kv_pages.at[:, dst].set(kv_pages[:, src])
        return fn

    @property
    def bytes_per_kv_block(self) -> int:
        el = jnp.dtype(self.model.config.kv_cache_dtype).itemsize
        return (self.model.num_layers * self.page_size *
                2 * self.model.num_kv_heads * self.model.head_dim * el)

    def _pick_bucket(self, n: int) -> int:
        for b in self.token_buckets:
            if n <= b:
                return b
        raise ValueError(f"{n} tokens exceeds max bucket "
                         f"{self.token_buckets[-1]}")

    # ------------------------------------------------------------------ #
    # Forward + sample for one scheduled batch
    # ------------------------------------------------------------------ #
    def forward_step(self, batch: ScheduledRequests,
                     use_penalties: bool = False,
                     logits_mask: Optional[np.ndarray] = None,
                     collect_hidden: bool = False,
                     collect_logits: bool = False):
        """Launch one iteration; returns (tokens, logprobs) device futures
        indexed by batch row. With ``collect_logits`` the processed
        logits rows land in ``self._last_logits_rows`` (device future;
        the host logits-processor path fetches them)."""
        inp = self.prepare_inputs(batch)
        T = self._pick_bucket(inp.num_tokens)
        pad = T - inp.num_tokens
        num_slots = self.num_kv_pages * self.page_size
        S, G = self.max_batch_size, self.max_draft_len + 1
        self.iter_counter += 1

        use_tree = inp.tree_masks is not None
        rows = (6 if self._vswa else 5) + (3 if self._mrope else 0) \
            + (1 if self._mmg else 0) + (1 if use_tree else 0)
        ints_t = np.zeros((rows, T), np.int32)
        ints_t[0, :inp.num_tokens] = inp.token_ids
        ints_t[1, :] = -1
        ints_t[1, :inp.num_tokens] = inp.prev_slot
        ints_t[2, :inp.num_tokens] = inp.positions
        # padding tokens write to an out-of-range slot → dropped by scatter
        ints_t[3, :] = num_slots
        ints_t[3, :inp.num_tokens] = inp.slot_mapping
        ints_t[4, :] = -1
        ints_t[4, :inp.num_tokens] = inp.lora_slots
        if self._vswa:
            ints_t[5, :] = self.num_sw_pages * self.page_size
            ints_t[5, :inp.num_tokens] = inp.slot_mapping_sw
        extra = -1 if use_tree else 0
        if self._mrope:
            ints_t[extra - 3:extra or None, :inp.num_tokens] = \
                inp.positions_mrope
        if self._mmg:
            ints_t[extra - 1, :] = -1
            ints_t[extra - 1, :inp.num_tokens] = inp.mm_groups
        if use_tree:
            ints_t[-1, :inp.num_tokens] = inp.tree_masks

        reqs = batch.context_requests + batch.generation_requests
        top_k = np.zeros(S, np.int32)
        greedy = np.zeros(S, np.int32)
        floats = np.zeros((6, S), np.float32)
        floats[0] = 1.0  # temperature
        floats[1] = 1.0  # top_p
        floats[3] = 1.0  # repetition
        for i, r in enumerate(reqs):
            sp = r.sampling_params
            greedy[i] = int(sp.greedy)
            top_k[i] = sp.top_k
            floats[0, i] = max(sp.temperature, 1e-5)
            floats[1, i] = sp.top_p
            floats[2, i] = sp.min_p
            floats[3, i] = sp.repetition_penalty
            floats[4, i] = sp.presence_penalty
            floats[5, i] = sp.frequency_penalty
        seeds = np.zeros(S, np.int32)
        for i, r in enumerate(reqs):
            if r.sampling_params.seed:
                seeds[i] = r.sampling_params.seed & 0x7FFFFFFF or 1
        draft_ids = np.full(S * G, -1, np.int32)
        if G > 1:
            nc = len(batch.context_requests)
            for i, r in enumerate(batch.generation_requests):
                ds = r.draft_tokens[:self.max_draft_len]
                row = (nc + i) * G
                draft_ids[row:row + len(ds)] = ds
        ngram_n = np.zeros(S, np.int32)
        for i, r in enumerate(reqs):
            ngram_n[i] = min(r.sampling_params.no_repeat_ngram_size, 8)
        ints_s = np.concatenate([
            inp.kv_lens, inp.cu_q_lens, inp.logits_indices, inp.out_slots,
            top_k, greedy, inp.num_seqs,
            np.asarray([self.iter_counter], np.int32), seeds, draft_ids,
            ngram_n])

        counts = getattr(self, "token_counts", None)
        if use_penalties and counts is None:
            counts = jnp.zeros((S, self.model.vocab_size), jnp.int32)
        use_mask = logits_mask is not None
        all_greedy = all(r.sampling_params.greedy for r in reqs)
        # round the requested top-k logprob count to a small fixed menu so
        # variants stay few (0 = none)
        want_lp = max((r.sampling_params.logprobs or 0) for r in reqs) \
            if reqs else 0
        num_logprobs = 0 if want_lp == 0 else min(
            next(k for k in (1, 5, 8, 20) if k >= min(want_lp, 20)), 20)
        # multimodal / prompt-embedding rows (NaN = use token lookup)
        embeds = None
        if any(r.prompt_embeds is not None
               for r in batch.context_requests):
            # deepstack VLMs pack extra per-layer feature columns
            H = getattr(self.model, "prompt_embeds_width",
                        self.model.hidden_size)
            embeds = np.full((T, H), np.nan, np.float32)
            pos = 0
            for r in batch.context_requests:
                start = r.context_current_position
                end = min(r.context_len, start + r.context_chunk_size)
                if r.prompt_embeds is not None:
                    embeds[pos:pos + (end - start)] = \
                        np.asarray(r.prompt_embeds)[start:end]
                pos += end - start
        use_embeds = embeds is not None
        use_lora = (self.lora_manager is not None
                    and self.lora_params is not None
                    and any(r.lora_task_id is not None for r in reqs))
        # device-guided masking handles only the G==1 layout (guided +
        # drafts stays on the host-sync path, as in the reference)
        use_guided = self.g_enabled and G == 1 and any(
            r.sampling_params.guided_decoding is not None
            and getattr(r, "guided_device", False) for r in reqs)
        use_ngram = bool(ngram_n.any()) and self.ngram_history is not None
        use_bias = self.bias_pool is not None and any(
            r.sampling_params.embedding_bias is not None for r in reqs)
        step_fn = self._get_step_fn(use_penalties, use_mask, all_greedy,
                                    num_logprobs, use_embeds, use_lora,
                                    collect_hidden, use_tree, use_guided,
                                    use_ngram, use_bias, collect_logits)
        mask_arr = jnp.asarray(logits_mask) if use_mask else \
            jnp.zeros((1, 1), bool)
        embeds_arr = jnp.asarray(embeds) if use_embeds else \
            jnp.zeros((1, 1), jnp.float32)
        lora_arg = self.lora_params if use_lora else 0
        out = step_fn(self.params, self.kv_pages, self.prev_tokens,
                      counts if use_penalties else jnp.zeros((1, 1), jnp.int32),
                      jnp.asarray(ints_t), jnp.asarray(ints_s),
                      jnp.asarray(np.stack([inp.page_indices,
                                            inp.page_indices_sw])
                                  if self._vswa else inp.page_indices),
                      jnp.asarray(floats),
                      mask_arr, embeds_arr, lora_arg,
                      *self._guided_args(use_guided),
                      *self._aux_args(use_ngram, use_bias))
        (tokens, logprobs, tl_vals, tl_ids, self.prev_tokens, new_counts,
         self.kv_pages, hidden, g_state, hist, logits_rows,
         moe_counts) = out
        if self._moe_stats:
            self._last_moe_counts = moe_counts    # [L, E] device future
        if use_guided:
            self.g_state = g_state
        if use_ngram:
            self.ngram_history = hist
        if use_penalties:
            self.token_counts = new_counts
        top_lp = (tl_vals, tl_ids) if num_logprobs else None
        if collect_logits:
            self._last_logits_rows = logits_rows
        if collect_hidden:
            return tokens, logprobs, top_lp, hidden
        return tokens, logprobs, top_lp
