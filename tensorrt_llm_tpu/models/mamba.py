"""Mamba (S6 SSM) decoder.

Behavioral reference: tensorrt_llm/_torch/models (mamba hybrids) + the
selective-scan kernel family (ref: kernels/selectiveScan/,
mamba_cache_manager.py). No attention and no paged KV: the "cache" is
slot-indexed recurrent state {conv_state, ssm_state} per layer, riding
the layer scan exactly like KV pages do for transformers. Chunked
prefill and prefix reuse are disabled for this family (state is not
block-addressable); the engine's paged bookkeeping is inert.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.norm import rms_norm
from ..ops.ssm import causal_conv1d, selective_scan
from .modeling_utils import (DecoderModelForCausalLM, ModelConfig,
                             quantize_linear, register_model)


@register_model("mamba")
class MambaForCausalLM(DecoderModelForCausalLM):
    architectures = ("MambaForCausalLM",)
    has_recurrent_state = True

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.intermediate = getattr(hf, "intermediate_size", None) or \
            hf.expand * hf.hidden_size
        self.state_size = hf.state_size
        self.conv_kernel = hf.conv_kernel
        self.dt_rank = getattr(hf, "time_step_rank", None) or \
            -(-hf.hidden_size // 16)
        self.eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.num_heads = 1  # no attention sharding
        # FalconMamba: weightless RMS on dt/B/C (subclass sets the eps)
        self.bcdt_rms_eps = None
        self.m_lin = self._method("mixer")
        self.m_lm_head = self._method("lm_head")

    @property
    def num_layers(self) -> int:
        return self.hf.num_hidden_layers

    @property
    def num_kv_heads(self) -> int:
        return 1

    @property
    def head_dim(self) -> int:
        return 1

    # recurrent state instead of paged KV ------------------------------- #
    def kv_pool_shape(self, num_pages, page_size):  # unused; state below
        return (1,)

    def make_kv_pages(self, num_pages: int, page_size: int):
        L, I, N, k = (self.num_layers, self.intermediate, self.state_size,
                      self.conv_kernel)
        slots = self.config.mapping.world_size * 0 + \
            getattr(self, "_num_slots", 64)
        return {
            "conv_state": jnp.zeros((L, slots, I, k - 1), jnp.float32),
            "ssm_state": jnp.zeros((L, slots, I, N), jnp.float32),
        }

    def kv_pspec(self):
        return {"conv_state": P(), "ssm_state": P()}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        hf = self.hf
        H, I, N, R, k = (self.hidden_size, self.intermediate,
                         self.state_size, self.dt_rank, self.conv_kernel)
        L, V = self.num_layers, self.vocab_size
        nprng = np.random.default_rng(0)

        def mat(shape):
            return nprng.standard_normal(shape, np.float32) * 0.02

        sd: Dict[str, np.ndarray] = {
            "backbone.embeddings.weight": mat((V, H)),
            "backbone.norm_f.weight": np.ones(H, np.float32),
        }
        for i in range(L):
            p = f"backbone.layers.{i}"
            sd[f"{p}.norm.weight"] = np.ones(H, np.float32)
            sd[f"{p}.mixer.in_proj.weight"] = mat((2 * I, H))
            sd[f"{p}.mixer.conv1d.weight"] = mat((I, 1, k))
            sd[f"{p}.mixer.conv1d.bias"] = np.zeros(I, np.float32)
            sd[f"{p}.mixer.x_proj.weight"] = mat((R + 2 * N, I))
            sd[f"{p}.mixer.dt_proj.weight"] = mat((I, R))
            sd[f"{p}.mixer.dt_proj.bias"] = np.full(I, -2.0, np.float32)
            sd[f"{p}.mixer.A_log.weight"] = np.log(
                np.tile(np.arange(1, N + 1, dtype=np.float32), (I, 1)))
            sd[f"{p}.mixer.D.weight"] = np.ones(I, np.float32)
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.num_layers
        dtype = self.dtype

        def g(name):
            for cand in (name, name.replace(".weight", "")):
                if cand in sd:
                    return np.asarray(sd[cand])
            raise KeyError(name)

        def t(name):
            return np.ascontiguousarray(np.transpose(g(name)))

        def per_layer(i):
            p = f"backbone.layers.{i}.mixer"
            return {
                "norm": jnp.asarray(g(f"backbone.layers.{i}.norm.weight"),
                                    dtype=dtype),
                "in_proj": quantize_linear(self.m_lin, t(f"{p}.in_proj.weight"),
                                           dtype=dtype),
                "conv_w": jnp.asarray(g(f"{p}.conv1d.weight")[:, 0, :],
                                      dtype=jnp.float32),
                "conv_b": jnp.asarray(g(f"{p}.conv1d.bias"), jnp.float32),
                "x_proj": quantize_linear(self.m_lin, t(f"{p}.x_proj.weight"),
                                          dtype=dtype),
                "dt_proj": quantize_linear(self.m_lin,
                                           t(f"{p}.dt_proj.weight"),
                                           bias=g(f"{p}.dt_proj.bias"),
                                           dtype=dtype),
                "out_proj": quantize_linear(self.m_lin,
                                            t(f"{p}.out_proj.weight"),
                                            dtype=dtype),
                "A_log": jnp.asarray(g(f"{p}.A_log.weight"), jnp.float32),
                "D": jnp.asarray(g(f"{p}.D.weight"), jnp.float32),
            }

        layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[per_layer(i) for i in range(L)])
        wte = g("backbone.embeddings.weight")
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dtype)},
            "layers": layers,
            "final_norm": jnp.asarray(g("backbone.norm_f.weight"),
                                      dtype=dtype),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dtype),
        }

    # ------------------------------------------------------------------ #
    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        I, R, N = self.intermediate, self.dt_rank, self.state_size

        def layer_body(h, xs):
            layer, conv_state, ssm_state = xs
            normed = rms_norm(h, layer["norm"], self.eps)
            xz = self.m_lin.apply(layer["in_proj"], normed)
            x, z = xz[:, :I], xz[:, I:]
            x_conv, new_conv = causal_conv1d(
                x, layer["conv_w"], layer["conv_b"], conv_state, metadata)
            x_act = jax.nn.silu(x_conv).astype(self.dtype)
            dbc = self.m_lin.apply(layer["x_proj"], x_act)
            dt_r, B, C = dbc[:, :R], dbc[:, R:R + N], dbc[:, R + N:]
            if self.bcdt_rms_eps is not None:
                def _rms(v):
                    vf = v.astype(jnp.float32)
                    var = jnp.mean(jnp.square(vf), -1, keepdims=True)
                    return (vf * jax.lax.rsqrt(
                        var + self.bcdt_rms_eps)).astype(v.dtype)
                dt_r, B, C = _rms(dt_r), _rms(B), _rms(C)
            dt = jax.nn.softplus(
                self.m_lin.apply(layer["dt_proj"], dt_r)
                .astype(jnp.float32))
            A = -jnp.exp(layer["A_log"])
            y, new_ssm = selective_scan(x_act, dt, A, B, C, layer["D"],
                                        ssm_state, metadata)
            y = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
            out = self.m_lin.apply(layer["out_proj"], y.astype(self.dtype))
            return h + out, (new_conv, new_ssm)

        h, (conv_states, ssm_states) = jax.lax.scan(
            layer_body, h,
            (params["layers"], kv_pages["conv_state"],
             kv_pages["ssm_state"]))
        h = rms_norm(h, params["final_norm"], self.eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), {
            "conv_state": conv_states, "ssm_state": ssm_states}


@register_model("falcon_mamba")
class FalconMambaForCausalLM(MambaForCausalLM):
    """FalconMamba: Mamba1 with WEIGHTLESS RMS normalization applied to
    dt/B/C after x_proj (HF FalconMambaMixer rms_forward,
    eps=config.mixer_rms_eps). Reference role: the falcon-mamba row of
    the reference model matrix."""
    architectures = ("FalconMambaForCausalLM",)

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        self.bcdt_rms_eps = getattr(self.hf, "mixer_rms_eps", 1e-6)
