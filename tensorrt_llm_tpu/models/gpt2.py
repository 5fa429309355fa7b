"""GPT-2 decoder (the minimal end-to-end reference model).

Behavioral reference: tensorrt_llm/models/gpt/ (legacy flow) and HF
transformers GPT2LMHeadModel numerics. Learned absolute position
embeddings, pre-LayerNorm with bias, GELU MLP, tied LM head. HF stores
GPT-2 weights as Conv1D [in, out] — already our [K, N] layout.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.attention import AttentionMetadata
from ..ops.norm import layer_norm
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)


@register_model("gpt2")
class GPT2LMHeadModel(DecoderModelForCausalLM):
    architectures = ("GPT2LMHeadModel",)

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.n_embd
        self.num_heads = hf.n_head
        self.inner = getattr(hf, "n_inner", None) or 4 * hf.n_embd
        self.ln_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim), rope=None)
        self.m_attn = self._method("attn")
        self.m_mlp = self._method("mlp")
        self.m_lm_head = self._method("lm_head")

    @property
    def num_layers(self) -> int:
        return self.hf.n_layer

    @property
    def num_kv_heads(self) -> int:
        return self.hf.n_head

    @property
    def head_dim(self) -> int:
        return self.hf.n_embd // self.hf.n_head

    # ------------------------------------------------------------------ #
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        hf = self.hf
        H, V, I, L = self.hidden_size, self.vocab_size, self.inner, self.num_layers
        nprng = np.random.default_rng(0)

        def mat(shape):
            return nprng.standard_normal(shape, np.float32) * 0.02

        sd = {"wte.weight": mat((V, H)), "wpe.weight": mat((hf.n_positions, H))}
        attn_w, proj_w = mat((L, H, 3 * H)), mat((L, H, H))
        fc_w, fcp_w = mat((L, H, I)), mat((L, I, H))
        for i in range(L):
            sd[f"h.{i}.attn.c_attn.weight"] = attn_w[i]
            sd[f"h.{i}.attn.c_attn.bias"] = np.zeros(3 * H, np.float32)
            sd[f"h.{i}.attn.c_proj.weight"] = proj_w[i]
            sd[f"h.{i}.attn.c_proj.bias"] = np.zeros(H, np.float32)
            sd[f"h.{i}.mlp.c_fc.weight"] = fc_w[i]
            sd[f"h.{i}.mlp.c_fc.bias"] = np.zeros(I, np.float32)
            sd[f"h.{i}.mlp.c_proj.weight"] = fcp_w[i]
            sd[f"h.{i}.mlp.c_proj.bias"] = np.zeros(H, np.float32)
            for ln in ("ln_1", "ln_2"):
                sd[f"h.{i}.{ln}.weight"] = np.ones(H, np.float32)
                sd[f"h.{i}.{ln}.bias"] = np.zeros(H, np.float32)
        sd["ln_f.weight"] = np.ones(H, np.float32)
        sd["ln_f.bias"] = np.zeros(H, np.float32)
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L, H = self.num_layers, self.hidden_size
        dtype = self.dtype

        def strip(name):  # HF prefixes with "transformer."
            return sd.get(name, sd.get(f"transformer.{name}"))

        def split_qkv(i):
            w = np.asarray(strip(f"h.{i}.attn.c_attn.weight"))  # [H, 3H]
            b = np.asarray(strip(f"h.{i}.attn.c_attn.bias"))
            return ((w[:, :H], b[:H]), (w[:, H:2 * H], b[H:2 * H]),
                    (w[:, 2 * H:], b[2 * H:]))

        def stack(fn):
            per = [fn(i) for i in range(L)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

        layers = {
            "ln1_w": stack(lambda i: jnp.asarray(strip(f"h.{i}.ln_1.weight"), dtype=dtype)),
            "ln1_b": stack(lambda i: jnp.asarray(strip(f"h.{i}.ln_1.bias"), dtype=dtype)),
            "ln2_w": stack(lambda i: jnp.asarray(strip(f"h.{i}.ln_2.weight"), dtype=dtype)),
            "ln2_b": stack(lambda i: jnp.asarray(strip(f"h.{i}.ln_2.bias"), dtype=dtype)),
            "q": stack(lambda i: quantize_linear(
                self.m_attn, split_qkv(i)[0][0], split_qkv(i)[0][1], dtype)),
            "k": stack(lambda i: quantize_linear(
                self.m_attn, split_qkv(i)[1][0], split_qkv(i)[1][1], dtype)),
            "v": stack(lambda i: quantize_linear(
                self.m_attn, split_qkv(i)[2][0], split_qkv(i)[2][1], dtype)),
            "o": stack(lambda i: quantize_linear(
                self.m_attn, np.asarray(strip(f"h.{i}.attn.c_proj.weight")),
                np.asarray(strip(f"h.{i}.attn.c_proj.bias")), dtype)),
            "fc": stack(lambda i: quantize_linear(
                self.m_mlp, np.asarray(strip(f"h.{i}.mlp.c_fc.weight")),
                np.asarray(strip(f"h.{i}.mlp.c_fc.bias")), dtype)),
            "proj": stack(lambda i: quantize_linear(
                self.m_mlp, np.asarray(strip(f"h.{i}.mlp.c_proj.weight")),
                np.asarray(strip(f"h.{i}.mlp.c_proj.bias")), dtype)),
        }
        wte = np.asarray(strip("wte.weight"))
        params = {
            "embed": {"weight": jnp.asarray(wte, dtype=dtype)},
            "wpe": jnp.asarray(strip("wpe.weight"), dtype=dtype),
            "layers": layers,
            "lnf_w": jnp.asarray(strip("ln_f.weight"), dtype=dtype),
            "lnf_b": jnp.asarray(strip("ln_f.bias"), dtype=dtype),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(wte.T), dtype=dtype),
        }
        return params

    # ------------------------------------------------------------------ #
    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None):
        h = self._embed(params, token_ids, input_embeds)
        h = h + params["wpe"][metadata.positions].astype(self.dtype)
        spec = self.attn_spec
        eps = self.ln_eps

        shard_mesh, shard_axis = self.attn_shard_args()

        # pool-as-carry threading (ops/attention.py layer_metadata): the
        # flat all-layers pool updates in place in the scan carry
        from ..ops.attention import layer_metadata
        L_n, P_n, ps_n = kv_pages.shape[:3]
        kv_flat = kv_pages.reshape((L_n * P_n,) + kv_pages.shape[2:])

        def layer_body(carry, xs):
            h, kvf = carry
            layer, li = xs
            md_l = layer_metadata(metadata, li, P_n, ps_n, L_n)
            normed = layer_norm(h, layer["ln1_w"], layer["ln1_b"], eps)
            attn_out, kvf = attention_block(
                layer, normed, kvf, md_l, spec,
                self.m_attn, self.m_attn, attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale,
                mesh=shard_mesh, tp_axis=shard_axis)
            h = h + attn_out
            normed = layer_norm(h, layer["ln2_w"], layer["ln2_b"], eps)
            fc = self.m_mlp.apply(layer["fc"], normed)
            act = jax.nn.gelu(fc.astype(jnp.float32), approximate=True)
            h = h + self.m_mlp.apply(layer["proj"], act.astype(self.dtype))
            return (h, kvf), None

        (h, kv_flat), _ = jax.lax.scan(
            layer_body, (h, kv_flat),
            (params["layers"], jnp.arange(L_n, dtype=jnp.int32)))
        kv_pages = kv_flat.reshape((L_n, P_n) + kv_flat.shape[1:])
        h = layer_norm(h, params["lnf_w"], params["lnf_b"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), kv_pages

    def param_pspecs(self, params) -> Any:
        def linear_spec(p, col: bool):
            spec = {}
            for k, v in p.items():
                nd = v.ndim
                if k == "weight":
                    spec[k] = P(*([None] * (nd - 2)),
                                None if col else "tp", "tp" if col else None)
                else:
                    spec[k] = P(*([None] * (nd - 1)), "tp" if col else None)
            return spec

        layers = params["layers"]
        lspec = {k: P(None, None) for k in
                 ("ln1_w", "ln1_b", "ln2_w", "ln2_b")}
        lspec.update(
            q=linear_spec(layers["q"], True), k=linear_spec(layers["k"], True),
            v=linear_spec(layers["v"], True), o=linear_spec(layers["o"], False),
            fc=linear_spec(layers["fc"], True),
            proj=linear_spec(layers["proj"], False))
        return {
            "embed": {"weight": P(None, None)},
            "wpe": P(None, None),
            "layers": lspec,
            "lnf_w": P(None), "lnf_b": P(None),
            "lm_head": linear_spec(params["lm_head"], True),
        }

    def kv_pspec(self) -> P:
        tp = self.config.mapping.tp_size
        if (2 * self.num_kv_heads) % tp == 0 and tp > 1:
            return P(None, None, None, "tp", None)
        return P()
