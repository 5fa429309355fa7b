"""EAGLE-style one-model speculative head.

Behavioral reference: tensorrt_llm/_torch/speculative/eagle3.py:1 — a
single trained decoder layer predicts the target's next hidden feature
from (current feature, next token embedding); draft tokens come from
applying the target's lm_head to predicted features, autoregressively.

TPU-native structure mirrors TwoModelDrafter: the head is a pure
function + its own one-layer paged KV pool with fixed page runs per
request slot. The executor streams (token, target-feature) pairs for
every accepted token (`LlmRequest.eagle_feats`); each
``prepare_draft_tokens`` call runs ONE jitted program per token bucket:
a ragged catch-up pass writing the verified features into the head's KV
(positioned at the target history), then a K-step scan proposing draft
tokens from predicted features.

Deviation from the reference noted for honesty: the head here attends
only over GENERATED positions' features (prompt features are not
fetched — only the prompt-final feature enters, with the first
generated token), and the fused input is [feature; embed] with the
target's own embedding/lm_head unless the checkpoint provides its own.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..runtime.request import LlmRequest
from .interface import Drafter


class Eagle3Drafter(Drafter):
    wants_hidden_states = True

    def __init__(self, target_model, target_params, *,
                 max_draft_len: int = 4, max_slots: int = 32,
                 page_size: int = 32, max_seq_len: int = 2048,
                 head_state_dict: Optional[Dict[str, np.ndarray]] = None,
                 token_buckets: Tuple[int, ...] = (16, 64, 256)):
        super().__init__(max_draft_len)
        import jax
        import jax.numpy as jnp

        self.model = target_model
        self.H = target_model.hidden_size
        self.nq = target_model.num_heads
        self.nkv = target_model.num_kv_heads
        self.hd = target_model.head_dim
        self.dtype = target_model.dtype
        self.page_size = page_size
        self.max_seq_len = max_seq_len
        self.max_slots = max_slots
        self.pages_per_slot = -(-max_seq_len // page_size)
        # the head's own single-layer paged KV
        self.kv = jnp.zeros((max_slots * self.pages_per_slot, page_size,
                             2 * self.nkv, self.hd), self.dtype)
        self._state: Dict[int, Tuple[int, int]] = {}  # rid -> (slot, pos)
        self._free = list(range(max_slots - 1, -1, -1))
        self._fns: Dict[int, Any] = {}
        self.token_buckets = tuple(t for t in token_buckets
                                   if t <= max_seq_len) or (64,)
        P = self.pages_per_slot
        self._page_indices = np.arange(
            max_slots * P, dtype=np.int32).reshape(max_slots, P)
        self.params = jax.device_put(
            self._load_head(head_state_dict, target_params))
        # borrow embedding + lm_head from the target (standard EAGLE);
        # device-resident — a host copy would re-upload ~100MB per call
        self.embed = jax.device_put(
            jnp.asarray(target_params["embed"]["weight"], self.dtype))
        lm = target_params["lm_head"]
        if "weight_scale" in lm:      # quantized target head: dequantize
            from ..ops.quant import dequantize_weight
            lm_w = dequantize_weight(lm["weight"], lm["weight_scale"],
                                     dtype=self.dtype)
        else:
            lm_w = jnp.asarray(lm["weight"], self.dtype)
        self.lm_head = jax.device_put({"weight": lm_w})
        self.acceptance_window: List[int] = []  # accepted-per-step stats
        # top-b tree proposal (0/1 = linear chain): b nodes per level,
        # depth = max_draft_len // b levels
        self.tree_width = 0
        # dynamic tree: keep the per-level candidate POOL and cut the
        # final tree as the global top-max_draft_len by cumulative
        # logprob (reference: eagle3_dynamic_tree.py)
        self.dynamic_tree = False
        # DFlash block proposal (reference: speculative/dflash.py):
        # target-feature-conditioned head predicts the whole K-token
        # draft block in ONE forward over K mask rows instead of the
        # autoregressive chain; DFlash-trained heads carry the mask id
        self.parallel_block = False
        self.mask_token_id = 0

    # ------------------------------------------------------------------ #
    def _load_head(self, sd, target_params):
        """Head params: fuse [2H, H] + one llama-style decoder layer.
        Accepts the public EAGLE checkpoint naming (fc.weight,
        layers.0.* / midlayer.*); missing tensors fall back to random
        init so the mechanism runs without a trained head."""
        import jax
        import jax.numpy as jnp
        H, nq, nkv, hd = self.H, self.nq, self.nkv, self.hd
        I = getattr(self.model.hf, "intermediate_size", 4 * H)
        r = np.random.default_rng(7)

        def mat(shape):
            return (r.standard_normal(shape, np.float32) * 0.02) \
                .astype(np.float32)

        def get(*names, shape, transpose=True):
            for n in names:
                if sd is not None and n in sd:
                    w = np.asarray(sd[n], np.float32)
                    return w.T if transpose else w
            return mat(shape)

        pre = ("layers.0.", "midlayer.")
        def layer_w(suffix, shape):
            return get(*[p + suffix for p in pre], shape=shape)

        params = {
            "fuse": {"weight": jnp.asarray(
                get("fc.weight", shape=(2 * H, H)), self.dtype)},
            "input_norm": jnp.asarray(get(
                *[p + "input_layernorm.weight" for p in pre],
                "hidden_norm.weight", shape=(H,), transpose=False),
                self.dtype),
            "post_norm": jnp.asarray(get(
                *[p + "post_attention_layernorm.weight" for p in pre],
                shape=(H,), transpose=False), self.dtype),
            "q": {"weight": jnp.asarray(layer_w(
                "self_attn.q_proj.weight", (H, nq * hd)), self.dtype)},
            "k": {"weight": jnp.asarray(layer_w(
                "self_attn.k_proj.weight", (H, nkv * hd)), self.dtype)},
            "v": {"weight": jnp.asarray(layer_w(
                "self_attn.v_proj.weight", (H, nkv * hd)), self.dtype)},
            "o": {"weight": jnp.asarray(layer_w(
                "self_attn.o_proj.weight", (nq * hd, H)), self.dtype)},
            "gate": {"weight": jnp.asarray(layer_w(
                "mlp.gate_proj.weight", (H, I)), self.dtype)},
            "up": {"weight": jnp.asarray(layer_w(
                "mlp.up_proj.weight", (H, I)), self.dtype)},
            "down": {"weight": jnp.asarray(layer_w(
                "mlp.down_proj.weight", (I, H)), self.dtype)},
        }
        return params

    # ------------------------------------------------------------------ #
    def _head_forward(self, params, feats, tok_ids, kv, md, embed_w):
        """One decoder-layer pass over fused [feature; embed] inputs.
        feats [T, H], tok_ids [T] -> (new features [T, H], kv)."""
        import jax
        import jax.numpy as jnp
        from ..models.modeling_utils import attention_block, AttentionSpec
        from ..ops.norm import rms_norm
        from ..ops.rope import RopeConfig, rope_cos_sin
        from ..ops.linear import make_linear_method
        from ..llmapi.llm_args import QuantConfig

        e = embed_w[tok_ids].astype(self.dtype)
        x = jnp.concatenate([feats.astype(self.dtype), e], axis=-1)
        x = jnp.dot(x, params["fuse"]["weight"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        spec = AttentionSpec(
            num_heads=self.nq, num_kv_heads=self.nkv, head_dim=self.hd,
            sm_scale=1.0 / math.sqrt(self.hd),
            rope=RopeConfig(head_dim=self.hd,
                            max_position_embeddings=self.max_seq_len))
        method = make_linear_method(QuantConfig(), "eagle")
        normed = rms_norm(x, params["input_norm"], 1e-6)
        attn_out, kv = attention_block(
            params, normed, kv, md, spec, method, method,
            attn_backend=self.model.attn_backend)
        h = x + attn_out
        normed = rms_norm(h, params["post_norm"], 1e-6)
        g = jnp.dot(normed, params["gate"]["weight"],
                    preferred_element_type=jnp.float32)
        u = jnp.dot(normed, params["up"]["weight"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        a = jax.nn.silu(g).astype(self.dtype) * u
        h = h + jnp.dot(a, params["down"]["weight"],
                        preferred_element_type=jnp.float32) \
            .astype(self.dtype)
        return h, kv

    def _build_fn(self, T: int):
        import jax
        import jax.numpy as jnp
        from ..ops.attention import AttentionMetadata

        B = self.max_slots
        P = self.pages_per_slot
        ps = self.page_size
        K = self.max_draft_len
        oob = B * P * ps
        page_indices = jnp.asarray(self._page_indices)

        def propose(params, kv, embed_w, lm_head_w, feats, tok_ids,
                    positions, slot_map, kv_lens, cu_q, logits_idx,
                    next_pos, active):
            iota = jnp.arange(B, dtype=jnp.int32)
            md = AttentionMetadata(
                kv_lens=kv_lens, page_indices=page_indices,
                cu_q_lens=cu_q, num_seqs=jnp.full((1,), B, jnp.int32),
                slot_mapping=slot_map, positions=positions,
                logits_indices=logits_idx)
            h, kv = self._head_forward(params, feats, tok_ids, kv, md,
                                       embed_w)
            f = h[logits_idx]                       # [B, H] predicted feats
            logits = jnp.dot(f, lm_head_w,
                             preferred_element_type=jnp.float32)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)

            def body(carry, t):
                kv, f, tok = carry
                pos = next_pos + t
                sm = jnp.where(active,
                               page_indices[iota, jnp.clip(pos // ps, 0,
                                                           P - 1)] * ps
                               + pos % ps, oob)
                md = AttentionMetadata(
                    kv_lens=jnp.where(active, pos + 1, 1),
                    page_indices=page_indices,
                    cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32),
                    num_seqs=jnp.full((1,), B, jnp.int32),
                    slot_mapping=sm, positions=pos, logits_indices=iota)
                h, kv = self._head_forward(params, f, tok, kv, md,
                                           embed_w)
                logits = jnp.dot(h, lm_head_w,
                                 preferred_element_type=jnp.float32)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (kv, h, nxt), nxt

            if K > 1:
                (kv, _, _), rest = jax.lax.scan(
                    body, (kv, f, tok), jnp.arange(K - 1))
            else:
                rest = jnp.zeros((0, B), jnp.int32)
            return jnp.concatenate([tok[None], rest], axis=0), kv

        def propose_block(params, kv, embed_w, lm_head_w, feats, tok_ids,
                          positions, slot_map, kv_lens, cu_q, logits_idx,
                          next_pos, active):
            # DFlash: catch-up exactly as the chain, then ONE head
            # forward over K mask rows conditioned on the last target
            # feature — the whole draft block in a single call
            md = AttentionMetadata(
                kv_lens=kv_lens, page_indices=page_indices,
                cu_q_lens=cu_q, num_seqs=jnp.full((1,), B, jnp.int32),
                slot_mapping=slot_map, positions=positions,
                logits_indices=logits_idx)
            h, kv = self._head_forward(params, feats, tok_ids, kv, md,
                                       embed_w)
            f = h[logits_idx]                       # [B, H] last feature
            iota = jnp.arange(B, dtype=jnp.int32)
            jj = jnp.arange(K, dtype=jnp.int32)
            bp = next_pos[:, None] + jj[None]       # [B, K] mask slots
            sm = jnp.where(
                active[:, None],
                page_indices[iota[:, None],
                             jnp.clip(bp // ps, 0, P - 1)] * ps + bp % ps,
                oob)
            md2 = AttentionMetadata(
                kv_lens=jnp.where(active, next_pos + K, 1),
                page_indices=page_indices,
                cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32) * K,
                num_seqs=jnp.full((1,), B, jnp.int32),
                slot_mapping=sm.reshape(-1), positions=bp.reshape(-1),
                logits_indices=jnp.arange(B * K, dtype=jnp.int32))
            feats_blk = jnp.repeat(f, K, axis=0)    # feature-conditioned
            masks = jnp.full((B * K,), self.mask_token_id, jnp.int32)
            hh, kv = self._head_forward(params, feats_blk, masks, kv,
                                        md2, embed_w)
            logits = jnp.dot(hh, lm_head_w,
                             preferred_element_type=jnp.float32)
            tok = jnp.argmax(logits, -1).astype(jnp.int32).reshape(B, K)
            return tok.T, kv                         # [K, B]

        if self.parallel_block:
            return jax.jit(propose_block, donate_argnums=(1,))
        return jax.jit(propose, donate_argnums=(1,))

    def _get_fn(self, T: int):
        if T not in self._fns:
            self._fns[T] = self._build_fn(T)
        return self._fns[T]

    # ------------------------------------------------------------------ #
    # Tree proposal (reference: eagle3.py top-b tree drafting +
    # speculativeDecoding tree kernels). The head expands a BEAM of b
    # nodes per level: every node occupies its own head-KV slot at
    # position base+node_idx and attends [verified history + ancestors]
    # via the ancestry-bitmask attention (AttentionMetadata.tree_masks —
    # the same mask machinery the target uses to VERIFY the tree).
    # Output per request: draft_tokens in BFS order + draft_parents.
    # ------------------------------------------------------------------ #
    def _build_tree_fn(self, T: int, b: int, depth: int):
        import jax
        import jax.numpy as jnp
        from ..ops.attention import AttentionMetadata

        B = self.max_slots
        P = self.pages_per_slot
        ps = self.page_size
        N = b * depth
        oob = B * P * ps
        page_indices = jnp.asarray(self._page_indices)
        iota_b = jnp.arange(B, dtype=jnp.int32)

        def propose(params, kv, embed_w, lm_head_w, feats, tok_ids,
                    positions, slot_map, kv_lens, cu_q, logits_idx,
                    next_pos, active):
            # --- catch-up over the verified (token, feature) stream ---
            md = AttentionMetadata(
                kv_lens=kv_lens, page_indices=page_indices,
                cu_q_lens=cu_q, num_seqs=jnp.full((1,), B, jnp.int32),
                slot_mapping=slot_map, positions=positions,
                logits_indices=logits_idx)
            h, kv = self._head_forward(params, feats, tok_ids, kv, md,
                                       embed_w)
            f0 = h[logits_idx]                          # [B, H]
            lg = jax.nn.log_softmax(
                jnp.dot(f0, lm_head_w,
                        preferred_element_type=jnp.float32), -1)
            lp0, tok0 = jax.lax.top_k(lg, b)            # [B, b]

            # candidate POOL for the dynamic tree (reference:
            # eagle3_dynamic_tree.py — per-step re-ranked tree under a
            # token budget): every level's b*b candidates with their
            # cumulative logprob and pool-indexed parent. Cumulative
            # logprob is monotone non-increasing along paths, so a
            # host-side top-budget cut is automatically ancestor-closed.
            bb = b * b
            pool_tok = jnp.zeros((B, depth, bb), jnp.int32)
            pool_cum = jnp.full((B, depth, bb), -jnp.inf, jnp.float32)
            pool_par = jnp.full((B, depth, bb), -1, jnp.int32)
            pool_tok = pool_tok.at[:, 0, :b].set(tok0)
            pool_cum = pool_cum.at[:, 0, :b].set(lp0)

            node_tok = jnp.zeros((B, N), jnp.int32)
            node_par = jnp.full((B, N), -1, jnp.int32)
            node_tok = node_tok.at[:, :b].set(tok0)
            sel_pool = jnp.broadcast_to(
                jnp.arange(b, dtype=jnp.int32)[None], (B, b))
            # frontier state: the b newest nodes per request
            fr_feat = jnp.broadcast_to(f0[:, None, :],
                                       (B, b, f0.shape[-1]))
            fr_tok = tok0
            fr_mask = jnp.broadcast_to(
                (1 << jnp.arange(b, dtype=jnp.int32))[None], (B, b))
            fr_lp = lp0
            fr_idx = jnp.broadcast_to(
                jnp.arange(b, dtype=jnp.int32)[None], (B, b))

            def level(carry, l):
                (kv, node_tok, node_par, fr_feat, fr_tok, fr_mask,
                 fr_lp, fr_idx, pool_tok, pool_cum, pool_par,
                 sel_pool) = carry
                # write + expand the frontier: B*b rows, node positions
                pos = (next_pos[:, None] + fr_idx).reshape(-1)
                sm = jnp.where(
                    jnp.repeat(active, b),
                    page_indices[jnp.repeat(iota_b, b),
                                 jnp.clip(pos // ps, 0, P - 1)] * ps
                    + pos % ps, oob)
                kvl = jnp.where(active, next_pos + l * b, 1)
                md = AttentionMetadata(
                    kv_lens=kvl, page_indices=page_indices,
                    cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32) * b,
                    num_seqs=jnp.full((1,), B, jnp.int32),
                    slot_mapping=sm, positions=pos,
                    logits_indices=jnp.arange(B * b, dtype=jnp.int32),
                    tree_masks=fr_mask.reshape(-1),
                    tree_lens=jnp.where(active, l * b, 0))
                hh, kv = self._head_forward(
                    params, fr_feat.reshape(B * b, -1),
                    fr_tok.reshape(-1), kv, md, embed_w)
                lg = jax.nn.log_softmax(
                    jnp.dot(hh, lm_head_w,
                            preferred_element_type=jnp.float32), -1)
                clp, ctok = jax.lax.top_k(lg.reshape(B, b, -1), b)
                # b*b candidates per request -> global top-b by cum lp
                cum = (fr_lp[:, :, None] + clp).reshape(B, b * b)
                # dynamic-tree pool: record ALL b*b candidates at this
                # level with pool-indexed parents
                all_par = sel_pool[:, jnp.arange(b * b,
                                                 dtype=jnp.int32) // b]
                pool_tok = jax.lax.dynamic_update_index_in_dim(
                    pool_tok, ctok.reshape(B, b * b), l, axis=1)
                pool_cum = jax.lax.dynamic_update_index_in_dim(
                    pool_cum, cum, l, axis=1)
                pool_par = jax.lax.dynamic_update_index_in_dim(
                    pool_par, all_par, l, axis=1)
                best_lp, flat = jax.lax.top_k(cum, b)   # [B, b]
                par_row = flat // b                     # frontier row
                sel_pool = l * (b * b) + flat
                new_idx = l * b + jnp.arange(b, dtype=jnp.int32)[None]
                new_tok = jnp.take_along_axis(
                    ctok.reshape(B, b * b), flat, axis=1)
                node_tok = jax.lax.dynamic_update_slice(
                    node_tok, new_tok, (0, l * b))
                node_par = jax.lax.dynamic_update_slice(
                    node_par, jnp.take_along_axis(fr_idx, par_row, axis=1),
                    (0, l * b))
                nfeat = jnp.take_along_axis(
                    hh.reshape(B, b, -1), par_row[:, :, None], axis=1)
                nmask = jnp.take_along_axis(fr_mask, par_row, axis=1) | \
                    (1 << new_idx)
                return (kv, node_tok, node_par, nfeat, new_tok, nmask,
                        best_lp, jnp.broadcast_to(new_idx, (B, b)),
                        pool_tok, pool_cum, pool_par, sel_pool), None

            if depth > 1:
                carry = (kv, node_tok, node_par, fr_feat, fr_tok,
                         fr_mask, fr_lp, fr_idx, pool_tok, pool_cum,
                         pool_par, sel_pool)
                carry, _ = jax.lax.scan(level, carry,
                                        jnp.arange(1, depth))
                (kv, node_tok, node_par) = carry[0], carry[1], carry[2]
                pool_tok, pool_cum, pool_par = carry[8], carry[9], carry[10]
            D = depth * b * b
            return (node_tok, node_par, kv, pool_tok.reshape(B, D),
                    pool_cum.reshape(B, D), pool_par.reshape(B, D))

        return jax.jit(propose, donate_argnums=(1,))

    def _get_tree_fn(self, T: int, b: int, depth: int):
        key = ("tree", T, b, depth)
        if key not in self._fns:
            self._fns[key] = self._build_tree_fn(T, b, depth)
        return self._fns[key]

    def _pick_bucket(self, n: int) -> int:
        for b in self.token_buckets:
            if n <= b:
                return b
        return self.token_buckets[-1]

    # ------------------------------------------------------------------ #
    def prepare_draft_tokens(self, requests: Sequence[LlmRequest]) -> None:
        import jax.numpy as jnp

        B, ps, P = self.max_slots, self.page_size, self.pages_per_slot
        work = []
        for req in requests:
            req.draft_tokens = []
            feats = req.eagle_feats
            if not feats:
                continue
            if len(req.all_token_ids) + self.max_draft_len + 1 >= \
                    self.max_seq_len:
                continue
            st = self._state.get(req.request_id)
            if st is None:
                if not self._free:
                    continue
                st = (self._free.pop(), 0)
                self._state[req.request_id] = st
            work.append((req, st[0], st[1], list(feats)))
        if not work:
            return
        total = sum(len(w[3]) for w in work)
        T = self._pick_bucket(total)
        while total > T:
            work.sort(key=lambda w: len(w[3]))
            total -= len(work.pop()[3])

        H = self.H
        feats_arr = np.zeros((T, H), np.float32)
        tok_ids = np.zeros(T, np.int32)
        positions = np.zeros(T, np.int32)
        slot_map = np.full(T, B * P * ps, np.int32)
        kv_lens = np.ones(B, np.int32)
        cu_q = np.zeros(B + 1, np.int32)
        logits_idx = np.zeros(B, np.int32)
        next_pos = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        t = 0
        for i, (req, slot, pos0, feats) in enumerate(work):
            n = len(feats)
            pages = self._page_indices[slot]
            for j, (tok, f) in enumerate(feats):
                feats_arr[t + j] = f
                tok_ids[t + j] = tok
                p = pos0 + j
                positions[t + j] = p
                slot_map[t + j] = pages[p // ps] * ps + p % ps
            kv_lens[i] = pos0 + n
            logits_idx[i] = t + n - 1
            next_pos[i] = pos0 + n
            active[i] = True
            t += n
        cu_q[1:len(work) + 1] = np.cumsum([len(w[3]) for w in work])
        cu_q[len(work) + 1:] = cu_q[len(work)]

        args = (self.params, self.kv, self.embed,
                self.lm_head["weight"],
                jnp.asarray(feats_arr), jnp.asarray(tok_ids),
                jnp.asarray(positions), jnp.asarray(slot_map),
                jnp.asarray(kv_lens), jnp.asarray(cu_q),
                jnp.asarray(logits_idx), jnp.asarray(next_pos),
                jnp.asarray(active))
        tree_b = self.tree_width if self.tree_width > 1 else 0
        if tree_b and self.max_draft_len // tree_b >= 1:
            depth = max(1, self.max_draft_len // tree_b)
            (node_tok, node_par, self.kv, pool_tok, pool_cum,
             pool_par) = self._get_tree_fn(T, tree_b, depth)(*args)
            node_tok = np.asarray(node_tok)
            node_par = np.asarray(node_par)
            if self.dynamic_tree:
                pool_tok = np.asarray(pool_tok)
                pool_cum = np.asarray(pool_cum)
                pool_par = np.asarray(pool_par)
        else:
            tree_b = 0
            toks, self.kv = self._get_fn(T)(*args)
            toks = np.asarray(toks)
        for i, (req, slot, pos0, feats) in enumerate(work):
            # verified features are now resident up to pos0 + n; the
            # proposal's own KV beyond that is scratch (masked, then
            # overwritten by the next catch-up)
            self._state[req.request_id] = (slot, pos0 + len(feats))
            req.eagle_feats = req.eagle_feats[len(feats):]
            if tree_b:
                if self.dynamic_tree:
                    # dynamic tree (reference: eagle3_dynamic_tree.py):
                    # global top-budget cut over the whole candidate
                    # pool — tree shape adapts per step. Cumulative
                    # logprob is monotone along paths, so ancestors
                    # sort first and the cut is closure-safe (the
                    # guard below handles exact ties).
                    cum = pool_cum[i]
                    order = np.argsort(-cum, kind="stable")
                    remap: Dict[int, int] = {}
                    toks_, pars_ = [], []
                    for p in order:
                        if len(toks_) >= self.max_draft_len or \
                                not np.isfinite(cum[p]):
                            break
                        pp = int(pool_par[i, p])
                        if pp >= 0 and pp not in remap:
                            continue
                        remap[int(p)] = len(toks_)
                        toks_.append(int(pool_tok[i, p]))
                        pars_.append(remap[pp] if pp >= 0 else -1)
                    req.draft_tokens = toks_
                    req.draft_parents = pars_
                    continue
                req.draft_tokens = [int(x) for x in node_tok[i]]
                req.draft_parents = [int(x) for x in node_par[i]]
                continue
            req.draft_tokens = [int(x) for x in toks[:, i]]

    def update(self, request: LlmRequest, accepted: List[int]) -> None:
        self.acceptance_window.append(len(accepted))
        if len(self.acceptance_window) > 512:
            self.acceptance_window.pop(0)

    def drop_request(self, request_id: int) -> None:
        st = self._state.pop(request_id, None)
        if st is not None:
            self._free.append(st[0])
