"""BERT encoder (sequence classification / reranking).

Behavioral reference: tensorrt_llm/_torch/models/modeling_bert.py
(BertModel + BertPooler + BertForSequenceClassification — used for
reranker serving); HF modeling_bert.py is the numeric spec. Encoder
models have no KV cache and no autoregression: the TPU-native shape is
ONE jitted bidirectional pass over a padded [B, L] batch (bucketed on
L), entirely outside the decoder executor. ``LLM.classify`` drives it.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modeling_utils import ModelConfig, register_model


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


@register_model("bert")
class BertForSequenceClassification:
    """Not a DecoderModelForCausalLM: no paged KV, no sampling. The LLM
    facade detects ``is_encoder_only`` and exposes ``classify``."""
    architectures = ("BertForSequenceClassification",)
    is_encoder_only = True

    def __init__(self, model_config: ModelConfig):
        self.config = model_config
        self.hf = model_config.hf_config
        self.dtype = model_config.dtype
        self.hidden_size = self.hf.hidden_size
        self.num_heads = self.hf.num_attention_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.num_layers = self.hf.num_hidden_layers
        self.eps = getattr(self.hf, "layer_norm_eps", 1e-12)
        self.num_labels = getattr(self.hf, "num_labels", 2)
        self._fns: Dict[int, Any] = {}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import BertForSequenceClassification as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dt = self.dtype
        a = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)
        t = lambda n: jnp.asarray(
            np.ascontiguousarray(np.asarray(sd[n]).T), dt)

        def layer(i):
            p = f"bert.encoder.layer.{i}."
            return {
                "q_w": t(p + "attention.self.query.weight"),
                "q_b": a(p + "attention.self.query.bias"),
                "k_w": t(p + "attention.self.key.weight"),
                "k_b": a(p + "attention.self.key.bias"),
                "v_w": t(p + "attention.self.value.weight"),
                "v_b": a(p + "attention.self.value.bias"),
                "ao_w": t(p + "attention.output.dense.weight"),
                "ao_b": a(p + "attention.output.dense.bias"),
                "aln_w": a(p + "attention.output.LayerNorm.weight"),
                "aln_b": a(p + "attention.output.LayerNorm.bias"),
                "i_w": t(p + "intermediate.dense.weight"),
                "i_b": a(p + "intermediate.dense.bias"),
                "o_w": t(p + "output.dense.weight"),
                "o_b": a(p + "output.dense.bias"),
                "oln_w": a(p + "output.LayerNorm.weight"),
                "oln_b": a(p + "output.LayerNorm.bias"),
            }

        return {
            "wte": a("bert.embeddings.word_embeddings.weight"),
            "wpe": a("bert.embeddings.position_embeddings.weight"),
            "wtt": a("bert.embeddings.token_type_embeddings.weight"),
            "eln_w": a("bert.embeddings.LayerNorm.weight"),
            "eln_b": a("bert.embeddings.LayerNorm.bias"),
            "layers": jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[layer(i) for i in range(self.num_layers)]),
            "pool_w": t("bert.pooler.dense.weight"),
            "pool_b": a("bert.pooler.dense.bias"),
            "cls_w": t("classifier.weight"),
            "cls_b": a("classifier.bias"),
        }

    # ------------------------------------------------------------------ #
    def _forward(self, params, token_ids, mask, token_type):
        B, L = token_ids.shape
        h = params["wte"][token_ids] + params["wpe"][None, :L] + \
            params["wtt"][token_type]
        h = _ln(h, params["eln_w"], params["eln_b"], self.eps)
        nh, hd = self.num_heads, self.head_dim
        attn_mask = (mask[:, None, None, :] > 0)

        def body(h, blk):
            def lin(w, b, x):
                return (jnp.dot(x, w, preferred_element_type=jnp.float32)
                        .astype(self.dtype) + b)
            q = lin(blk["q_w"], blk["q_b"], h).reshape(B, L, nh, hd)
            k = lin(blk["k_w"], blk["k_b"], h).reshape(B, L, nh, hd)
            v = lin(blk["v_w"], blk["v_b"], h).reshape(B, L, nh, hd)
            scores = jnp.einsum("bthd,bshd->bhts",
                                q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(hd)
            scores = jnp.where(attn_mask, scores,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(scores, -1)
            o = jnp.einsum("bhts,bshd->bthd", probs,
                           v.astype(jnp.float32)).reshape(B, L, nh * hd)
            o = lin(blk["ao_w"], blk["ao_b"], o.astype(self.dtype))
            h = _ln(h + o, blk["aln_w"], blk["aln_b"], self.eps)
            f = lin(blk["i_w"], blk["i_b"], h)
            f = jax.nn.gelu(f.astype(jnp.float32), approximate=False) \
                .astype(self.dtype)
            f = lin(blk["o_w"], blk["o_b"], f)
            h = _ln(h + f, blk["oln_w"], blk["oln_b"], self.eps)
            return h, None

        h, _ = jax.lax.scan(body, h, params["layers"])
        pooled = jnp.tanh(
            jnp.dot(h[:, 0], params["pool_w"],
                    preferred_element_type=jnp.float32) + params["pool_b"])
        logits = jnp.dot(pooled.astype(self.dtype), params["cls_w"],
                         preferred_element_type=jnp.float32) + \
            params["cls_b"]
        return logits.astype(jnp.float32)

    def classify(self, params, batch_token_ids: List[List[int]],
                 token_type_ids: List[List[int]] = None,
                 buckets: Tuple[int, ...] = (32, 128, 512)) -> np.ndarray:
        """Pad to a length bucket and run one jitted pass."""
        B = len(batch_token_ids)
        maxlen = max(len(x) for x in batch_token_ids)
        L = next((b for b in buckets if b >= maxlen), maxlen)
        ids = np.zeros((B, L), np.int32)
        mask = np.zeros((B, L), np.int32)
        tt = np.zeros((B, L), np.int32)
        for i, row in enumerate(batch_token_ids):
            ids[i, :len(row)] = row
            mask[i, :len(row)] = 1
            if token_type_ids is not None:
                tt[i, :len(row)] = token_type_ids[i]
        key = (L,)
        if key not in self._fns:
            self._fns[key] = jax.jit(self._forward)
        return np.asarray(self._fns[key](params, jnp.asarray(ids),
                                         jnp.asarray(mask),
                                         jnp.asarray(tt)))
