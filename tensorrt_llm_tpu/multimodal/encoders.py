"""Vision encoders (CLIP / SigLIP ViT towers) in JAX.

Behavioral reference: tensorrt_llm/_torch/models/modeling_clip.py and
modeling_siglip.py (multimodal_encoders/) — the vision half of LLaVA-
style VLMs. TPU-native shape: the whole tower is one jitted function;
the patch "convolution" is an unfold+matmul (stride == kernel, so the
conv is exactly a per-patch linear); encoder layers run under
``lax.scan`` over stacked weights like the LM decoders.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w + b).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class VisionTower:
    """Shared CLIP/SigLIP ViT body. Differences are data, not code:
    CLIP prepends a class token, uses quick_gelu and a pre-layernorm;
    SigLIP has a biased patch conv, tanh-gelu, and no class token."""

    def __init__(self, hf_config, *, flavor: str, dtype=jnp.float32):
        self.hf = hf_config
        self.flavor = flavor                      # "clip" | "siglip"
        self.dtype = dtype
        self.D = hf_config.hidden_size
        self.heads = hf_config.num_attention_heads
        self.layers = hf_config.num_hidden_layers
        self.patch = hf_config.patch_size
        self.image_size = hf_config.image_size
        self.eps = getattr(hf_config, "layer_norm_eps", 1e-5)
        self.num_patches = (self.image_size // self.patch) ** 2
        self.num_pos = self.num_patches + (1 if flavor == "clip" else 0)
        self.act = _quick_gelu if getattr(
            hf_config, "hidden_act", "quick_gelu") == "quick_gelu" \
            else (lambda x: jax.nn.gelu(x, approximate=True))

    # -- weights -----------------------------------------------------------
    def load_hf_state_dict(self, sd: Dict[str, np.ndarray],
                           prefix: str = "vision_model.") -> Dict[str, Any]:
        D, L = self.D, self.layers
        dt = self.dtype

        def g(name):
            return np.asarray(sd[prefix + name])

        def lin(name):
            w = np.ascontiguousarray(g(name + ".weight").T).astype(np.float32)
            out = {"weight": jnp.asarray(w, dt)}
            if prefix + name + ".bias" in sd:
                out["bias"] = jnp.asarray(g(name + ".bias"), dt)
            return out

        def stack(fn):
            per = [fn(i) for i in range(L)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

        pe = g("embeddings.patch_embedding.weight")   # [D, 3, P, P]
        patch_w = pe.transpose(2, 3, 1, 0).reshape(-1, D)  # [P*P*3, D]
        params: Dict[str, Any] = {
            "patch": {"weight": jnp.asarray(patch_w, dt)},
            "pos": jnp.asarray(
                g("embeddings.position_embedding.weight"), dt),
        }
        if prefix + "embeddings.patch_embedding.bias" in sd:
            params["patch"]["bias"] = jnp.asarray(
                g("embeddings.patch_embedding.bias"), dt)
        if self.flavor == "clip":
            params["cls"] = jnp.asarray(g("embeddings.class_embedding"), dt)
            params["pre_ln"] = {
                "w": jnp.asarray(g("pre_layrnorm.weight"), dt),
                "b": jnp.asarray(g("pre_layrnorm.bias"), dt)}

        def layer(i):
            p = f"encoder.layers.{i}."
            return {
                "ln1_w": jnp.asarray(g(p + "layer_norm1.weight"), dt),
                "ln1_b": jnp.asarray(g(p + "layer_norm1.bias"), dt),
                "ln2_w": jnp.asarray(g(p + "layer_norm2.weight"), dt),
                "ln2_b": jnp.asarray(g(p + "layer_norm2.bias"), dt),
                "q": lin(p + "self_attn.q_proj"),
                "k": lin(p + "self_attn.k_proj"),
                "v": lin(p + "self_attn.v_proj"),
                "o": lin(p + "self_attn.out_proj"),
                "fc1": lin(p + "mlp.fc1"),
                "fc2": lin(p + "mlp.fc2"),
            }
        params["layers"] = stack(layer)
        post = "post_layernorm"
        params["post_ln"] = {
            "w": jnp.asarray(g(post + ".weight"), dt),
            "b": jnp.asarray(g(post + ".bias"), dt)}
        return params

    # -- forward -----------------------------------------------------------
    def __call__(self, params: Dict[str, Any], pixel_values: jnp.ndarray,
                 feature_layer: int = -1,
                 apply_post_ln: bool = False) -> jnp.ndarray:
        """pixel_values [B, 3, H, W] → hidden states
        [B, tokens, D] taken after ``feature_layer`` encoder layers
        (−2 = LLaVA's penultimate-layer features; the final post-LN is
        applied only for feature_layer == -1, matching HF)."""
        B = pixel_values.shape[0]
        P, D = self.patch, self.D
        x = pixel_values.astype(self.dtype)
        # unfold into patches: [B, 3, H/P, P, W/P, P] -> [B, HP*WP, P*P*3]
        hp = wp = self.image_size // P
        x = x.reshape(B, 3, hp, P, wp, P)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(B, hp * wp, P * P * 3)
        h = jnp.dot(x, params["patch"]["weight"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if "bias" in params["patch"]:
            h = h + params["patch"]["bias"]
        if self.flavor == "clip":
            cls = jnp.broadcast_to(params["cls"], (B, 1, D))
            h = jnp.concatenate([cls.astype(self.dtype), h], axis=1)
        h = h + params["pos"][None, :h.shape[1]]
        if self.flavor == "clip":
            h = _ln(h, params["pre_ln"]["w"], params["pre_ln"]["b"],
                    self.eps)

        heads = self.heads
        hd = D // heads
        scale = 1.0 / math.sqrt(hd)
        n_run = self.layers + 1 + feature_layer if feature_layer < 0 \
            else feature_layer

        def apply(p, x):
            out = jnp.dot(x, p["weight"],
                          preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            if "bias" in p:
                out = out + p["bias"]
            return out

        def layer_body(carry, xs):
            h, idx = carry
            layer = xs

            def run(h):
                res = h
                x = _ln(h, layer["ln1_w"], layer["ln1_b"], self.eps)
                T = x.shape[1]
                q = apply(layer["q"], x).reshape(B, T, heads, hd)
                k = apply(layer["k"], x).reshape(B, T, heads, hd)
                v = apply(layer["v"], x).reshape(B, T, heads, hd)
                scores = jnp.einsum("bthd,bshd->bhts",
                                    q.astype(jnp.float32),
                                    k.astype(jnp.float32)) * scale
                probs = jax.nn.softmax(scores, axis=-1)
                attn = jnp.einsum("bhts,bshd->bthd", probs,
                                  v.astype(jnp.float32))
                attn = attn.reshape(B, T, D).astype(self.dtype)
                h = res + apply(layer["o"], attn)
                res = h
                x = _ln(h, layer["ln2_w"], layer["ln2_b"], self.eps)
                x = self.act(apply(layer["fc1"], x).astype(jnp.float32))
                h = res + apply(layer["fc2"], x.astype(self.dtype))
                return h

            # stop updating past the requested feature layer
            h = jnp.where(idx < n_run, run(h), h)
            return (h, idx + 1), None

        (h, _), _ = jax.lax.scan(layer_body, (h, 0), params["layers"])
        # HF hidden_states[feature_layer] are raw (post_layernorm only
        # touches the pooled CLS); last_hidden_state consumers (gemma3)
        # pass apply_post_ln=True for the final post-LN
        if apply_post_ln and feature_layer == -1:
            h = _ln(h, params["post_ln"]["w"], params["post_ln"]["b"],
                    self.eps)
        return h
