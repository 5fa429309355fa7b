"""Mllama (Llama 3.2 Vision): cross-attention vision-language model.

Behavioral reference: tensorrt_llm/_torch/models/modeling_mllama.py; HF
modeling_mllama.py is the numeric spec.

  * VISION: tiled CLIP-style tower — per-tile patch conv + class token,
    gated aspect-ratio tile embeddings, gated positional embeddings,
    pad-to-%8, LOCAL transformer (plain residuals) over all tiles
    jointly, post-LN, post-tile embeddings, GLOBAL transformer (gated
    residuals); output = final states ⊕ selected intermediate states.
  * TEXT: llama decoder whose ``cross_attention_layers`` attend vision
    features through per-layer K/V projections with per-head-dim qk
    norms and tanh-gated residuals. Cross K/V are computed ONCE per
    request at admission (model.compute_cross_kv) and live slot-indexed
    in the cache pytree; text-only rows skip cross layers entirely.

Note: per-token cross-attention masks (HF processor's
``cross_attention_mask`` limiting tokens to preceding images) are not
modeled — every text row attends all of the request's vision positions
(the ``cross_attention_mask=None`` semantics)."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.llama import LlamaForCausalLM
from ..models.modeling_utils import (AttentionSpec, ModelConfig,
                                     attention_block, quantize_linear,
                                     register_model)
from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig, rope_cos_sin
from .processor import mm_hash, register_input_processor


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class MllamaVisionTower:
    def __init__(self, vc, dtype):
        self.vc = vc
        self.dtype = dtype
        self.D = vc.hidden_size
        self.heads = getattr(vc, "attention_heads", None) or \
            vc.num_attention_heads
        self.hd = self.D // self.heads
        self.patch = vc.patch_size
        self.num_patches = (vc.image_size // vc.patch_size) ** 2 + 1
        self.max_tiles = vc.max_num_tiles
        self.inter_idx = list(vc.intermediate_layers_indices)
        self.n_local = vc.num_hidden_layers
        self.n_global = vc.num_global_layers

    def load_hf_state_dict(self, sd):
        dt = self.dtype
        a = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)
        t = lambda n: jnp.asarray(
            np.ascontiguousarray(np.asarray(sd[n]).T), dt)

        def layer(pfx, i, gated):
            p = f"{pfx}.layers.{i}."
            out = {
                "ln1_w": a(p + "input_layernorm.weight"),
                "ln1_b": a(p + "input_layernorm.bias"),
                "ln2_w": a(p + "post_attention_layernorm.weight"),
                "ln2_b": a(p + "post_attention_layernorm.bias"),
                "q": t(p + "self_attn.q_proj.weight"),
                "k": t(p + "self_attn.k_proj.weight"),
                "v": t(p + "self_attn.v_proj.weight"),
                "o": t(p + "self_attn.o_proj.weight"),
                "fc1_w": t(p + "mlp.fc1.weight"),
                "fc1_b": a(p + "mlp.fc1.bias"),
                "fc2_w": t(p + "mlp.fc2.weight"),
                "fc2_b": a(p + "mlp.fc2.bias"),
            }
            if gated:
                out["gate_attn"] = a(p + "gate_attn", jnp.float32)
                out["gate_ffn"] = a(p + "gate_ffn", jnp.float32)
            return out

        pe = np.asarray(sd["patch_embedding.weight"])    # [D, 3, P, P]
        return {
            "patch_w": jnp.asarray(
                pe.transpose(2, 3, 1, 0).reshape(-1, self.D), dt),
            "cls": a("class_embedding"),
            "pos_emb": a("gated_positional_embedding.embedding"),
            "pos_gate": a("gated_positional_embedding.gate", jnp.float32),
            "pos_tile": a("gated_positional_embedding.tile_embedding"
                          ".weight"),
            "pre_tile_emb": a("pre_tile_positional_embedding.embedding"
                              ".weight"),
            "pre_tile_gate": a("pre_tile_positional_embedding.gate",
                               jnp.float32),
            "post_tile_emb": a("post_tile_positional_embedding.embedding"
                               ".weight"),
            "post_tile_gate": a("post_tile_positional_embedding.gate",
                                jnp.float32),
            "ln_pre_w": a("layernorm_pre.weight"),
            "ln_pre_b": a("layernorm_pre.bias"),
            "ln_post_w": a("layernorm_post.weight"),
            "ln_post_b": a("layernorm_post.bias"),
            "local": jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[layer("transformer", i, False)
                  for i in range(self.n_local)]),
            "global": jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[layer("global_transformer", i, True)
                  for i in range(self.n_global)]),
        }

    def _attn(self, blk, x, mask):
        L = x.shape[0]
        h = _ln(x, blk["ln1_w"], blk["ln1_b"])
        q = jnp.dot(h, blk["q"], preferred_element_type=jnp.float32) \
            .reshape(L, self.heads, self.hd)
        k = jnp.dot(h, blk["k"], preferred_element_type=jnp.float32) \
            .reshape(L, self.heads, self.hd)
        v = jnp.dot(h, blk["v"], preferred_element_type=jnp.float32) \
            .reshape(L, self.heads, self.hd)
        scores = jnp.einsum("thd,shd->hts", q, k) / math.sqrt(self.hd)
        scores = jnp.where(mask[None], scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, -1)
        probs = jnp.where(jnp.any(mask, -1)[None, :, None], probs, 0.0)
        o = jnp.einsum("hts,shd->thd", probs, v).reshape(L, self.D)
        return jnp.dot(o.astype(self.dtype), blk["o"],
                       preferred_element_type=jnp.float32) \
            .astype(self.dtype)

    def _mlp(self, blk, x):
        h = _ln(x, blk["ln2_w"], blk["ln2_b"])
        f = jnp.dot(h, blk["fc1_w"],
                    preferred_element_type=jnp.float32) + blk["fc1_b"]
        f = jax.nn.gelu(f, approximate=False).astype(self.dtype)
        return jnp.dot(f, blk["fc2_w"],
                       preferred_element_type=jnp.float32) \
            .astype(self.dtype) + blk["fc2_b"]

    def encode(self, params, pixel_values, aspect_ratio_id,
               aspect_ratio_mask):
        """One image: pixel_values [tiles, 3, H, W], scalar aspect id,
        tile mask [tiles] → features [tiles, num_patches,
        D * (1 + len(intermediate))]."""
        px = jnp.asarray(np.asarray(pixel_values, np.float32))
        nt = px.shape[0]
        Pz, D = self.patch, self.D
        hp = self.vc.image_size // Pz
        x = px.reshape(nt, 3, hp, Pz, hp, Pz) \
            .transpose(0, 2, 4, 3, 5, 1).reshape(nt, hp * hp,
                                                 Pz * Pz * 3)
        h = jnp.dot(x.astype(self.dtype), params["patch_w"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        # pre-tile embedding (gated)
        pre = params["pre_tile_emb"][aspect_ratio_id] \
            .reshape(self.max_tiles, 1, D)[:nt]
        h = h + jnp.tanh(params["pre_tile_gate"]) * pre
        # class token
        cls = jnp.broadcast_to(params["cls"], (nt, 1, D))
        h = jnp.concatenate([cls.astype(self.dtype), h], axis=1)
        npat = h.shape[1]
        # gated positional embeddings
        pos = (1 - jnp.tanh(params["pos_gate"])) * params["pos_emb"]
        h = h + pos[None]
        tile_pos = params["pos_tile"][aspect_ratio_id].reshape(
            self.max_tiles, self.num_patches, D)[:nt]
        h = h + jnp.tanh(params["pos_gate"]) * tile_pos
        h = _ln(h, params["ln_pre_w"], params["ln_pre_b"])
        # pad patches to %8 and flatten tiles
        pad = (-npat) % 8
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        tl = npat + pad
        h = h.reshape(nt * tl, D)
        valid = jnp.repeat(jnp.asarray(aspect_ratio_mask, bool), tl)
        valid = valid & jnp.tile(
            jnp.arange(tl) < npat, nt)
        # HF quirk (outer product of INVERTED tile masks): positions are
        # blocked only when BOTH query and key are invalid — valid rows
        # attend padding/invalid-tile keys too
        mask = valid[:, None] | valid[None, :]

        # HF's encoder collects hidden states AFTER each layer (no
        # embedding entry): hidden_states[i] = output of layer i
        inters = []
        hs = h
        for i in range(self.n_local):
            blk = jax.tree.map(lambda a_: a_[i], params["local"])
            hs = hs + self._attn(blk, hs, mask)
            hs = hs + self._mlp(blk, hs)
            if i in self.inter_idx:
                inters.append(hs)
        hs = _ln(hs, params["ln_post_w"], params["ln_post_b"])
        # post-tile embedding
        hs = hs.reshape(nt, tl, D)
        post = params["post_tile_emb"][aspect_ratio_id] \
            .reshape(self.max_tiles, 1, D)[:nt]
        hs = hs + jnp.tanh(params["post_tile_gate"]) * post
        hs = hs.reshape(nt * tl, D)
        for i in range(self.n_global):
            blk = jax.tree.map(lambda a_: a_[i], params["global"])
            hs = hs + jnp.tanh(blk["gate_attn"]) * \
                self._attn(blk, hs, mask)
            hs = hs + jnp.tanh(blk["gate_ffn"]) * self._mlp(blk, hs)
        hs = hs.reshape(nt, tl, D)[:, :npat]
        inter = jnp.stack([x.reshape(nt, tl, D)[:, :npat]
                           for x in inters], axis=-1) \
            .reshape(nt, npat, D * len(inters)) if inters else None
        out = hs if inter is None else jnp.concatenate([hs, inter], -1)
        return out


@register_model("mllama")
class MllamaForConditionalGeneration(LlamaForCausalLM):
    architectures = ("MllamaForConditionalGeneration",)
    processor_type = "mllama"

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        super().__init__(dataclasses.replace(model_config,
                                             hf_config=text_config))
        self.image_token_index = self.vlm_config.image_token_index
        self.cross_layers = list(text_config.cross_attention_layers)
        self.self_layers = [i for i in range(self.num_layers)
                            if i not in self.cross_layers]
        vc = self.vlm_config.vision_config
        self.tower = MllamaVisionTower(vc, self.dtype)
        self.max_vision_tokens = vc.max_num_tiles * \
            ((vc.image_size // vc.patch_size) ** 2 + 1)
        self._vision_params = None
        self._projector = None
        self._num_slots = 0
        self._cross_kv_fn = None

    # cache pytree -------------------------------------------------------#
    def make_kv_pages(self, num_pages: int, page_size: int):
        kvh, hd = self.num_kv_heads, self.head_dim
        slots = max(self._num_slots, 1)
        Lv = self.max_vision_tokens
        nc = len(self.cross_layers)
        return {
            "kv": jnp.zeros((len(self.self_layers), num_pages, page_size,
                             2 * kvh, hd), self.config.kv_cache_dtype),
            "cross_k": jnp.zeros((nc, slots, Lv, kvh, hd), self.dtype),
            "cross_v": jnp.zeros((nc, slots, Lv, kvh, hd), self.dtype),
            "cross_len": jnp.zeros((slots,), jnp.int32),
        }

    def kv_pool_shape(self, num_pages: int, page_size: int):
        return (len(self.self_layers), num_pages, page_size,
                2 * self.num_kv_heads, self.head_dim)

    def kv_pspec(self):
        return {"kv": P(), "cross_k": P(), "cross_v": P(),
                "cross_len": P()}

    # weights ------------------------------------------------------------#
    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]):
        lm_sd, vis_sd, pj = {}, {}, {}
        cross_sd = {}
        for k, v in sd.items():
            k2 = k[len("model."):] if k.startswith("model.") else k
            if k2.startswith("language_model."):
                lm_sd["model." + k2[len("language_model."):]] = v
            elif k2.startswith("vision_model."):
                vis_sd[k2[len("vision_model."):]] = v
            elif k2.startswith("multi_modal_projector."):
                pj[k2[len("multi_modal_projector."):]] = v
            elif k2 == "lm_head.weight":
                lm_sd["lm_head.weight"] = v
        dt = self.dtype
        self._vision_params = self.tower.load_hf_state_dict(vis_sd)
        self._projector = {
            "w": jnp.asarray(np.ascontiguousarray(
                np.asarray(pj["weight"]).T), dt),
            "b": jnp.asarray(np.asarray(pj["bias"]), dt),
        }
        t = lambda n: np.ascontiguousarray(
            np.transpose(np.asarray(lm_sd[n])))
        arr = lambda n: jnp.asarray(np.asarray(lm_sd[n]), dt)

        def cross_layer(i):
            p = f"model.layers.{i}."
            c = p + "cross_attn."
            return {
                "norm": arr(p + "input_layernorm.weight"),
                "post_norm": arr(p + "post_attention_layernorm.weight"),
                "q": quantize_linear(self.m_q, t(c + "q_proj.weight"),
                                     dtype=dt),
                "k": quantize_linear(self.m_q, t(c + "k_proj.weight"),
                                     dtype=dt),
                "v": quantize_linear(self.m_q, t(c + "v_proj.weight"),
                                     dtype=dt),
                "o": quantize_linear(self.m_o, t(c + "o_proj.weight"),
                                     dtype=dt),
                "q_norm": arr(c + "q_norm.weight"),
                "k_norm": arr(c + "k_norm.weight"),
                "gate_attn": jnp.asarray(
                    np.asarray(lm_sd[p + "cross_attn_attn_gate"]),
                    jnp.float32),
                "gate_mlp": jnp.asarray(
                    np.asarray(lm_sd[p + "cross_attn_mlp_gate"]),
                    jnp.float32),
                "gate": quantize_linear(
                    self.m_mlp, t(p + "mlp.gate_proj.weight"), dtype=dt),
                "up": quantize_linear(
                    self.m_mlp, t(p + "mlp.up_proj.weight"), dtype=dt),
                "down": quantize_linear(
                    self.m_mlp, t(p + "mlp.down_proj.weight"), dtype=dt),
            }

        cross = [cross_layer(i) for i in self.cross_layers]
        self_sd = {}
        # re-index the self-attn layers densely for the llama loader
        for k, v in lm_sd.items():
            if k.startswith("model.layers."):
                parts = k.split(".")
                li = int(parts[2])
                if li in self.cross_layers:
                    continue
                parts[2] = str(self.self_layers.index(li))
                self_sd[".".join(parts)] = v
            else:
                self_sd[k] = v
        # the llama loader derives layer count from self.hf; patch the
        # dense count through a shallow copy
        orig_layers = self.hf.num_hidden_layers
        self.hf.num_hidden_layers = len(self.self_layers)
        try:
            params = super().load_hf_state_dict(self_sd)
        finally:
            self.hf.num_hidden_layers = orig_layers
        params["cross"] = jax.tree.map(lambda *xs: jnp.stack(xs), *cross)
        return params

    @property
    def num_layers(self) -> int:
        return self.hf.num_hidden_layers

    def init_params(self, rng):
        raise NotImplementedError("mllama requires checkpoint weights")

    # vision + cross KV --------------------------------------------------#
    def encode_images(self, pixel_values, aspect_ratio_ids,
                      aspect_ratio_mask) -> np.ndarray:
        """→ projected cross states [n_images * tiles * patches, H]."""
        outs = []
        for px, aid, am in zip(pixel_values, aspect_ratio_ids,
                               aspect_ratio_mask):
            f = self.tower.encode(self._vision_params, px, int(aid),
                                  np.asarray(am))
            f = jnp.dot(f.reshape(-1, f.shape[-1]), self._projector["w"],
                        preferred_element_type=jnp.float32) + \
                self._projector["b"]
            outs.append(np.asarray(f, np.float32))
        return np.concatenate(outs, axis=0)

    def compute_cross_kv(self, params, cross_states: np.ndarray):
        """Per-cross-layer K/V from the projected vision states
        (run once per request at admission)."""
        if self._cross_kv_fn is None:
            kvh, hd = self.num_kv_heads, self.head_dim

            def fn(cross, states):
                def one(layer, _):
                    k = self.m_q.apply(layer["k"], states) \
                        .reshape(-1, kvh, hd)
                    k = rms_norm(k, layer["k_norm"], self.rms_eps)
                    v = self.m_q.apply(layer["v"], states) \
                        .reshape(-1, kvh, hd)
                    return _, (k, v)
                _, (ks, vs) = jax.lax.scan(
                    lambda c, l: one(l, c), None, cross)
                return ks, vs
            self._cross_kv_fn = jax.jit(fn)
        return self._cross_kv_fn(
            params["cross"],
            jnp.asarray(cross_states, self.dtype))

    # forward ------------------------------------------------------------#
    def _cross_attn_block(self, layer, h, ck, cv, clen, metadata):
        """Cross-attention over slot-indexed vision K/V; rows of slots
        with clen == 0 pass through unchanged (text-only skip)."""
        T = h.shape[0]
        nq, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        S = metadata.kv_lens.shape[0]
        tok = jnp.arange(T, dtype=jnp.int32)
        seq_of = jnp.minimum(
            jnp.searchsorted(metadata.cu_q_lens[1:S + 1], tok,
                             side="right").astype(jnp.int32), S - 1)
        slot_of = jnp.clip(metadata.seq_slots, 0)[seq_of]
        normed = rms_norm(h, layer["norm"], self.rms_eps)
        q = self.m_q.apply(layer["q"], normed).reshape(T, nq, hd)
        q = rms_norm(q, layer["q_norm"], self.rms_eps)
        k = ck[slot_of]                                  # [T, Lv, kvh, hd]
        v = cv[slot_of]
        g = nq // kvh
        qg = q.reshape(T, kvh, g, hd)
        scores = jnp.einsum("tkgd,tlkd->tkgl", qg.astype(jnp.float32),
                            k.astype(jnp.float32)) / math.sqrt(hd)
        Lv = k.shape[1]
        ok = jnp.arange(Lv)[None, :] < clen[slot_of][:, None]
        scores = jnp.where(ok[:, None, None, :], scores,
                           jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, -1)
        probs = jnp.where(jnp.any(ok, -1)[:, None, None, None], probs, 0.)
        attn = jnp.einsum("tkgl,tlkd->tkgd", probs,
                          v.astype(jnp.float32)).reshape(T, nq * hd)
        attn = self.m_o.apply(layer["o"], attn.astype(self.dtype))
        has = (clen[slot_of] > 0)[:, None]
        h = h + jnp.where(has,
                          jnp.tanh(layer["gate_attn"]) * attn, 0.0)
        normed = rms_norm(h, layer["post_norm"], self.rms_eps)
        gg = self.m_mlp.apply(layer["gate"], normed)
        uu = self.m_mlp.apply(layer["up"], normed)
        mlp = self.m_mlp.apply(
            layer["down"],
            jax.nn.silu(gg.astype(jnp.float32)).astype(self.dtype) * uu)
        h = h + jnp.where(has, jnp.tanh(layer["gate_mlp"]) * mlp, 0.0)
        return h

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None,
                collect_hidden: bool = False):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        eps = self.rms_eps
        cos_sin = rope_cos_sin(spec.rope, metadata.positions)
        shard_mesh, shard_axis = self.attn_shard_args()
        kv = kv_pages["kv"]
        ck, cv = kv_pages["cross_k"], kv_pages["cross_v"]
        clen = kv_pages["cross_len"]

        def self_body(h, xs):
            layer, pages = xs
            attn_out, pages = attention_block(
                layer, rms_norm(h, layer["input_norm"], eps), pages,
                metadata, spec, self.m_q, self.m_o,
                attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale, rope_cos_sin=cos_sin,
                mesh=shard_mesh, tp_axis=shard_axis)
            h = h + attn_out
            normed = rms_norm(h, layer["post_norm"], eps)
            g = self.m_mlp.apply(layer["gate"], normed)
            u = self.m_mlp.apply(layer["up"], normed)
            h = h + self.m_mlp.apply(
                layer["down"],
                jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u)
            return h, pages

        # walk layers in original order: runs of self layers scan; each
        # cross layer applies its stacked slice
        new_kv = []
        si = 0
        ci = 0
        i = 0
        L = self.hf.num_hidden_layers
        while i < L:
            if i in self.cross_layers:
                layer = jax.tree.map(lambda a_: a_[ci], params["cross"])
                h = self._cross_attn_block(layer, h, ck[ci], cv[ci],
                                           clen, metadata)
                ci += 1
                i += 1
            else:
                n = 0
                while i + n < L and (i + n) not in self.cross_layers:
                    n += 1
                sl = jax.tree.map(lambda a_: a_[si:si + n],
                                  params["layers"])
                h, pages = jax.lax.scan(self_body, h,
                                        (sl, kv[si:si + n]))
                new_kv.append(pages)
                si += n
                i += n
        kv = jnp.concatenate(new_kv, axis=0) if new_kv else kv
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        out_cache = {"kv": kv, "cross_k": ck, "cross_v": cv,
                     "cross_len": clen}
        return logits.astype(jnp.float32), out_cache

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)


@register_input_processor("mllama")
class MllamaInputProcessor:
    """mm_data: ``pixel_values`` [n_img, tiles, 3, H, W],
    ``aspect_ratio_ids`` [n_img], ``aspect_ratio_mask`` [n_img, tiles]
    (HF MllamaImageProcessor outputs). Returns cross-state extras for
    admission-time K/V upload; prompt embeds stay pure text."""

    def __init__(self, model):
        self.model = model

    def __call__(self, token_ids: List[int], mm_data: Dict[str, Any]
                 ) -> Tuple[List[int], Any, str, Dict[str, Any]]:
        px = mm_data["pixel_values"]
        aids = mm_data["aspect_ratio_ids"]
        amask = mm_data["aspect_ratio_mask"]
        states = self.model.encode_images(px, aids, amask)
        return list(token_ids), None, \
            mm_hash([np.asarray(p) for p in px]), \
            {"cross_states": states}
