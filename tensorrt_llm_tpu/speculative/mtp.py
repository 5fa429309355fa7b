"""DeepSeek-V3 MTP (multi-token prediction) one-model speculation.

Behavioral reference: tensorrt_llm/_torch/speculative/mtp.py:280
(MTPWorker / MTPEagleWorker) + modeling_deepseekv3.py:1588
(DeepseekV3MTP): the checkpoint's extra layer at index
``num_hidden_layers`` is a FULL DeepSeek decoder layer (MLA + MoE) with
three additions — ``enorm``/``hnorm`` RMSNorms on the token embedding
and the target's last hidden state, an ``eh_proj`` [2H -> H] fuse, and a
``shared_head`` (final norm; lm_head shared with the target). The MTP
module at position i consumes (hidden_i, embed(token_{i+1})) and its
output hidden predicts token_{i+2}; chained autoregressively it drafts K
tokens (reference MTPEagleWorker reuses one module K times).

TPU-native structure mirrors Eagle3Drafter (eagle.py): the module owns a
single-layer paged LATENT cache (MLA latents, not full KV), the executor
streams (token, target-feature) pairs per accepted token, and each
``prepare_draft_tokens`` call runs ONE jitted program per token bucket —
a ragged catch-up pass writing verified features into the module's
latent cache, then a (K-1)-step scan proposing drafts.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..runtime.request import LlmRequest
from .interface import Drafter


class MtpDrafter(Drafter):
    wants_hidden_states = True

    def __init__(self, target_model, target_params, *,
                 max_draft_len: int = 3, max_slots: int = 32,
                 page_size: int = 32, max_seq_len: int = 2048,
                 head_state_dict: Optional[Dict[str, np.ndarray]] = None,
                 token_buckets: Tuple[int, ...] = (16, 64, 256)):
        super().__init__(max_draft_len)
        import jax
        import jax.numpy as jnp

        if not hasattr(target_model, "latent_dim"):
            raise ValueError("MTP speculation requires a DeepSeek-style "
                             "target model (MLA latent cache)")
        self.model = target_model
        self.H = target_model.hidden_size
        self.dtype = target_model.dtype
        self.eps = target_model.rms_eps
        self.page_size = page_size
        self.max_seq_len = max_seq_len
        self.max_slots = max_slots
        self.pages_per_slot = -(-max_seq_len // page_size)
        # single-layer paged MLA latent cache
        self.kv = jnp.zeros((max_slots * self.pages_per_slot, page_size,
                             target_model.latent_dim), self.dtype)
        self._state: Dict[int, Tuple[int, int]] = {}  # rid -> (slot, pos)
        self._free = list(range(max_slots - 1, -1, -1))
        self._fns: Dict[int, Any] = {}
        self.token_buckets = tuple(t for t in token_buckets
                                   if t <= max_seq_len) or (64,)
        P = self.pages_per_slot
        self._page_indices = np.arange(
            max_slots * P, dtype=np.int32).reshape(max_slots, P)
        self.params = jax.device_put(self._load_head(head_state_dict))
        self.embed = jax.device_put(
            jnp.asarray(target_params["embed"]["weight"], self.dtype))
        lm = target_params["lm_head"]
        if "weight_scale" in lm:
            from ..ops.quant import dequantize_weight
            lm_w = dequantize_weight(lm["weight"], lm["weight_scale"],
                                     dtype=self.dtype)
        else:
            lm_w = jnp.asarray(lm["weight"], self.dtype)
        self.lm_head = jax.device_put({"weight": lm_w})
        self.acceptance_window: List[int] = []

    # ------------------------------------------------------------------ #
    def _synth_state_dict(self, idx: int) -> Dict[str, np.ndarray]:
        """Random-init MTP tensors with checkpoint naming so the loader
        has ONE code path; used when no trained module is provided."""
        m = self.model
        H, nh = self.H, m.num_heads
        nope, rope_d, vd = m.qk_nope, m.qk_rope, m.v_dim
        lora = m.kv_lora_rank
        E, mi, ns = m.n_experts, m.moe_inter, m.n_shared
        r = np.random.default_rng(11)
        mat = lambda *s: (r.standard_normal(s, np.float32) * 0.02)
        ones = lambda n: np.ones(n, np.float32)
        p = f"model.layers.{idx}"
        sd = {
            f"{p}.self_attn.kv_a_proj_with_mqa.weight": mat(lora + rope_d, H),
            f"{p}.self_attn.kv_a_layernorm.weight": ones(lora),
            f"{p}.self_attn.kv_b_proj.weight": mat(nh * (nope + vd), lora),
            f"{p}.self_attn.o_proj.weight": mat(H, nh * vd),
            f"{p}.input_layernorm.weight": ones(H),
            f"{p}.post_attention_layernorm.weight": ones(H),
            f"{p}.mlp.gate.weight": mat(E, H),
            f"{p}.mlp.gate.e_score_correction_bias": np.zeros(E, np.float32),
            f"{p}.enorm.weight": ones(H),
            f"{p}.hnorm.weight": ones(H),
            f"{p}.eh_proj.weight": mat(H, 2 * H),
            f"{p}.shared_head.norm.weight": ones(H),
        }
        if m.q_lora_rank:
            sd[f"{p}.self_attn.q_a_proj.weight"] = mat(m.q_lora_rank, H)
            sd[f"{p}.self_attn.q_a_layernorm.weight"] = ones(m.q_lora_rank)
            sd[f"{p}.self_attn.q_b_proj.weight"] = \
                mat(nh * (nope + rope_d), m.q_lora_rank)
        else:
            sd[f"{p}.self_attn.q_proj.weight"] = mat(nh * (nope + rope_d), H)
        for e in range(E):
            sd[f"{p}.mlp.experts.{e}.gate_proj.weight"] = mat(mi, H)
            sd[f"{p}.mlp.experts.{e}.up_proj.weight"] = mat(mi, H)
            sd[f"{p}.mlp.experts.{e}.down_proj.weight"] = mat(H, mi)
        sd[f"{p}.mlp.shared_experts.gate_proj.weight"] = mat(ns * mi, H)
        sd[f"{p}.mlp.shared_experts.up_proj.weight"] = mat(ns * mi, H)
        sd[f"{p}.mlp.shared_experts.down_proj.weight"] = mat(H, ns * mi)
        return sd

    def _load_head(self, sd) -> Dict[str, Any]:
        import jax.numpy as jnp
        m = self.model
        idx = m.num_layers           # checkpoint places MTP at layer L
        if sd is None or f"model.layers.{idx}.eh_proj.weight" not in sd:
            sd = self._synth_state_dict(idx)
        layer = m._moe_layer_from_sd(sd, idx)
        p = f"model.layers.{idx}"
        layer["enorm"] = jnp.asarray(sd[f"{p}.enorm.weight"], self.dtype)
        layer["hnorm"] = jnp.asarray(sd[f"{p}.hnorm.weight"], self.dtype)
        layer["eh_proj"] = jnp.asarray(
            m._t(sd, f"{p}.eh_proj.weight"), self.dtype)
        layer["head_norm"] = jnp.asarray(
            sd[f"{p}.shared_head.norm.weight"], self.dtype)
        return layer

    # ------------------------------------------------------------------ #
    def _head_forward(self, params, feats, tok_ids, kv, md, embed_w):
        """One MTP-module pass: fuse (embed, hidden) then a full DeepSeek
        decoder layer. Returns (raw hidden [T,H] — feeds the next chained
        step, head-normed hidden for lm_head, latent pool)."""
        import jax.numpy as jnp
        from ..ops.norm import rms_norm
        from ..ops.rope import rope_cos_sin

        e = rms_norm(embed_w[tok_ids].astype(self.dtype), params["enorm"],
                     self.eps)
        hs = rms_norm(feats.astype(self.dtype), params["hnorm"], self.eps)
        x = jnp.dot(jnp.concatenate([e, hs], axis=-1), params["eh_proj"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        cos_sin = rope_cos_sin(self.model.rope_cfg, md.positions)
        normed = rms_norm(x, params["input_norm"], self.eps)
        attn, kv = self.model._mla_attention(params, normed, kv, md, cos_sin)
        h = x + attn
        normed = rms_norm(h, params["post_norm"], self.eps)
        h = h + self.model._moe_block(params, normed)
        f = rms_norm(h, params["head_norm"], self.eps)
        return h, f, kv

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
            h, f, kv = self._head_forward(params, feats, tok_ids, kv, md,
                                          embed_w)
            h = h[logits_idx]
            logits = jnp.dot(f[logits_idx], lm_head_w,
                             preferred_element_type=jnp.float32)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)

            def body(carry, t):
                kv, h, tok = carry
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
                h, f, kv = self._head_forward(params, h, tok, kv, md,
                                              embed_w)
                logits = jnp.dot(f, lm_head_w,
                                 preferred_element_type=jnp.float32)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (kv, h, nxt), nxt

            if K > 1:
                (kv, _, _), rest = jax.lax.scan(
                    body, (kv, h, tok), jnp.arange(K - 1))
            else:
                rest = jnp.zeros((0, B), jnp.int32)
            return jnp.concatenate([tok[None], rest], axis=0), kv

        return jax.jit(propose, donate_argnums=(1,))

    def _get_fn(self, T: int):
        if T not in self._fns:
            self._fns[T] = self._build_fn(T)
        return self._fns[T]

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

        fn = self._get_fn(T)
        toks, self.kv = fn(self.params, self.kv, self.embed,
                           self.lm_head["weight"],
                           jnp.asarray(feats_arr), jnp.asarray(tok_ids),
                           jnp.asarray(positions), jnp.asarray(slot_map),
                           jnp.asarray(kv_lens), jnp.asarray(cu_q),
                           jnp.asarray(logits_idx), jnp.asarray(next_pos),
                           jnp.asarray(active))
        toks = np.asarray(toks)
        for i, (req, slot, pos0, feats) in enumerate(work):
            self._state[req.request_id] = (slot, pos0 + len(feats))
            req.eagle_feats = req.eagle_feats[len(feats):]
            req.draft_tokens = [int(x) for x in toks[:, i]]

    def update(self, request: LlmRequest, accepted: List[int]) -> None:
        self.acceptance_window.append(len(accepted))
        if len(self.acceptance_window) > 512:
            self.acceptance_window.pop(0)

    def drop_request(self, request_id: int) -> None:
        st = self._state.pop(request_id, None)
        if st is not None:
            self._free.append(st[0])
