"""Mamba2 (SSD) decoder + reusable mixer for hybrid families.

Behavioral reference: the reference's Mamba2 metadata/kernels
(tensorrt_llm/_torch/models/modeling_nemotron_h.py mamba layers,
cpp chunk-scan kernel family); HF Mamba2Mixer.torch_forward is the
numeric spec. Differences from Mamba1: per-head scalar decay A[nh],
grouped B/C (n_groups), depthwise conv over the concatenated [x;B;C],
dt per head, and a GATED RMSNorm before out_proj. State cache is
slot-indexed {conv_state [conv_dim, k-1], ssm_state [nh, hd, N]},
riding the layer scan like Mamba1.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.norm import rms_norm
from ..ops.ssm import causal_conv1d, ssd_scan
from .modeling_utils import (DecoderModelForCausalLM, ModelConfig,
                             quantize_linear, register_model)


@dataclass(frozen=True)
class Mamba2Geom:
    intermediate: int
    num_heads: int
    head_dim: int
    n_groups: int
    state_size: int
    conv_kernel: int
    dt_min: float
    dt_max: float
    eps: float

    @property
    def conv_dim(self) -> int:
        return self.intermediate + 2 * self.n_groups * self.state_size


def mamba2_mixer(layer, normed, conv_state, ssm_state, metadata, geom,
                 m_lin, dtype):
    """One Mamba2 mixer pass over the flattened ragged batch.
    layer keys: in_proj, conv_w [conv_dim,k], conv_b, dt_bias [nh],
    A_log [nh], D [nh], gate_norm [I], out_proj."""
    I, nh, hd = geom.intermediate, geom.num_heads, geom.head_dim
    GN = geom.n_groups * geom.state_size
    zxbcdt = m_lin.apply(layer["in_proj"], normed)
    z = zxbcdt[:, :I]
    xbc = zxbcdt[:, I:I + geom.conv_dim]
    dt = zxbcdt[:, I + geom.conv_dim:]

    xbc, new_conv = causal_conv1d(xbc, layer["conv_w"], layer["conv_b"],
                                  conv_state, metadata)
    xbc = jax.nn.silu(xbc).astype(dtype)
    x = xbc[:, :I]
    B = xbc[:, I:I + GN]
    C = xbc[:, I + GN:]

    dt = jax.nn.softplus(dt.astype(jnp.float32)
                         + layer["dt_bias"].astype(jnp.float32))
    dt = jnp.clip(dt, geom.dt_min, geom.dt_max)
    A = -jnp.exp(layer["A_log"].astype(jnp.float32))
    T = x.shape[0]
    y, new_ssm = ssd_scan(
        x.reshape(T, nh, hd), dt, A,
        B.reshape(T, geom.n_groups, geom.state_size),
        C.reshape(T, geom.n_groups, geom.state_size),
        layer["D"], ssm_state, metadata)
    # gated RMSNorm over the full channel axis (HF MambaRMSNormGated)
    y = y.reshape(T, I).astype(jnp.float32) * \
        jax.nn.silu(z.astype(jnp.float32))
    var = jnp.mean(jnp.square(y), axis=-1, keepdims=True)
    y = y * jax.lax.rsqrt(var + geom.eps) * \
        layer["gate_norm"].astype(jnp.float32)
    return m_lin.apply(layer["out_proj"], y.astype(dtype)), \
        new_conv, new_ssm


def load_mamba2_layer(sd, prefix, m_lin, dtype):
    """Tensors for one HF mamba2 mixer at ``{prefix}.`` (e.g.
    ``backbone.layers.0.mixer``)."""
    g = lambda n: np.asarray(sd[n])
    t = lambda n: np.ascontiguousarray(np.transpose(g(n)))
    has_bias = f"{prefix}.in_proj.bias" in sd
    return {
        "in_proj": quantize_linear(
            m_lin, t(f"{prefix}.in_proj.weight"),
            bias=g(f"{prefix}.in_proj.bias") if has_bias else None,
            dtype=dtype),
        "conv_w": jnp.asarray(g(f"{prefix}.conv1d.weight")[:, 0, :],
                              jnp.float32),
        "conv_b": jnp.asarray(
            sd.get(f"{prefix}.conv1d.bias",
                   np.zeros(g(f"{prefix}.conv1d.weight").shape[0],
                            np.float32)), jnp.float32),
        "dt_bias": jnp.asarray(g(f"{prefix}.dt_bias"), jnp.float32),
        "A_log": jnp.asarray(g(f"{prefix}.A_log"), jnp.float32),
        "D": jnp.asarray(g(f"{prefix}.D"), jnp.float32),
        "gate_norm": jnp.asarray(g(f"{prefix}.norm.weight"), dtype=dtype),
        "out_proj": quantize_linear(
            m_lin, t(f"{prefix}.out_proj.weight"),
            bias=g(f"{prefix}.out_proj.bias")
            if f"{prefix}.out_proj.bias" in sd else None, dtype=dtype),
    }


@register_model("mamba2")
class Mamba2ForCausalLM(DecoderModelForCausalLM):
    architectures = ("Mamba2ForCausalLM",)
    has_recurrent_state = True

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        lim = getattr(hf, "time_step_limit", (0.0, float("inf")))
        self.geom = Mamba2Geom(
            intermediate=int(hf.expand * hf.hidden_size),
            num_heads=hf.num_heads, head_dim=hf.head_dim,
            n_groups=hf.n_groups, state_size=hf.state_size,
            conv_kernel=hf.conv_kernel, dt_min=lim[0], dt_max=lim[1],
            eps=getattr(hf, "layer_norm_epsilon", 1e-5))
        self.eps = self.geom.eps
        self.num_heads = 1
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

    def kv_pool_shape(self, num_pages, page_size):
        return (1,)

    def make_kv_pages(self, num_pages: int, page_size: int):
        L, g = self.num_layers, self.geom
        slots = getattr(self, "_num_slots", 64)
        return {
            "conv_state": jnp.zeros(
                (L, slots, g.conv_dim, g.conv_kernel - 1), jnp.float32),
            "ssm_state": jnp.zeros(
                (L, slots, g.num_heads, g.head_dim, g.state_size),
                jnp.float32),
        }

    def kv_pspec(self):
        return {"conv_state": P(), "ssm_state": P()}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import Mamba2ForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L, dtype = self.num_layers, self.dtype

        def per_layer(i):
            out = load_mamba2_layer(sd, f"backbone.layers.{i}.mixer",
                                    self.m_lin, dtype)
            out["norm"] = jnp.asarray(
                sd[f"backbone.layers.{i}.norm.weight"], dtype=dtype)
            return out

        layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[per_layer(i) for i in range(L)])
        wte = np.asarray(sd["backbone.embeddings.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dtype)},
            "layers": layers,
            "final_norm": jnp.asarray(sd["backbone.norm_f.weight"],
                                      dtype=dtype),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dtype),
        }

    # ------------------------------------------------------------------ #
    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)

        def layer_body(h, xs):
            layer, conv_state, ssm_state = xs
            normed = rms_norm(h, layer["norm"], self.eps)
            out, new_conv, new_ssm = mamba2_mixer(
                layer, normed, conv_state, ssm_state, metadata, self.geom,
                self.m_lin, self.dtype)
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
