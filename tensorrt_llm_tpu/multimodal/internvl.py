"""InternVL 3 vision-language model.

Behavioral reference: the reference's internvl support (multimodal
encoder registry); HF modeling_internvl.py is the numeric spec.
InternViT tower (cls token + learned positions, pre/post-LN blocks with
LAYERSCALE lambdas, optional qk norms) → drop CLS → pixel-shuffle
downsample (0.5) → LayerNorm + 2-layer GELU projector → spliced into
the text LM (qwen2/llama configs both ride the llama body)."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaForCausalLM
from ..models.modeling_utils import ModelConfig, register_model
from .processor import mm_hash, register_input_processor


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) *
            w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


class InternVLVisionTower:
    def __init__(self, vc, dtype):
        self.vc = vc
        self.dtype = dtype
        self.D = vc.hidden_size
        self.heads = vc.num_attention_heads
        self.hd = self.D // self.heads
        self.layers = vc.num_hidden_layers
        self.eps = getattr(vc, "layer_norm_eps", 1e-6)
        img = vc.image_size
        pat = vc.patch_size
        self.image_size = img[0] if isinstance(img, (list, tuple)) else img
        self.patch = pat[0] if isinstance(pat, (list, tuple)) else pat
        self.grid = self.image_size // self.patch
        self.use_qk_norm = bool(getattr(vc, "use_qk_norm", False))
        self.final_ln = not bool(getattr(vc, "use_mean_pooling", False))

    def load_hf_state_dict(self, sd):
        dt = self.dtype
        t = lambda n: jnp.asarray(
            np.ascontiguousarray(np.asarray(sd[n]).T), dt)
        a = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)

        def lin(n):
            out = {"w": t(n + ".weight")}
            if n + ".bias" in sd:
                out["b"] = a(n + ".bias")
            return out

        def layer(i):
            p = f"encoder.layer.{i}."
            out = {
                "ln1_w": a(p + "layernorm_before.weight"),
                "ln1_b": a(p + "layernorm_before.bias"),
                "ln2_w": a(p + "layernorm_after.weight"),
                "ln2_b": a(p + "layernorm_after.bias"),
                "q": lin(p + "attention.q_proj"),
                "k": lin(p + "attention.k_proj"),
                "v": lin(p + "attention.v_proj"),
                "o": lin(p + "attention.projection_layer"),
                "fc1": lin(p + "mlp.fc1"),
                "fc2": lin(p + "mlp.fc2"),
                "l1": a(p + "lambda_1", jnp.float32),
                "l2": a(p + "lambda_2", jnp.float32),
            }
            if self.use_qk_norm:
                out["qn"] = a(p + "attention.q_norm.weight")
                out["kn"] = a(p + "attention.k_norm.weight")
            return out

        pe = np.asarray(sd["embeddings.patch_embeddings.projection"
                            ".weight"])
        params = {
            "patch_w": jnp.asarray(
                pe.transpose(2, 3, 1, 0).reshape(-1, self.D), dt),
            "patch_b": a("embeddings.patch_embeddings.projection.bias"),
            "cls": a("embeddings.cls_token"),
            "pos": a("embeddings.position_embeddings"),
            "layers": jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[layer(i) for i in range(self.layers)]),
        }
        if self.final_ln:
            params["fln_w"] = a("layernorm.weight")
            params["fln_b"] = a("layernorm.bias")
        return params

    def __call__(self, params, pixel_values):
        B = pixel_values.shape[0]
        Pz, D = self.patch, self.D
        hp = self.grid
        x = pixel_values.astype(self.dtype)
        x = x.reshape(B, 3, hp, Pz, hp, Pz) \
            .transpose(0, 2, 4, 3, 5, 1).reshape(B, hp * hp, Pz * Pz * 3)
        h = jnp.dot(x, params["patch_w"],
                    preferred_element_type=jnp.float32) \
            .astype(self.dtype) + params["patch_b"]
        cls = jnp.broadcast_to(params["cls"][0], (B, 1, D))
        h = jnp.concatenate([cls.astype(self.dtype), h], axis=1)
        h = h + params["pos"][0][None, :h.shape[1]]

        def apply(p, x):
            out = jnp.dot(x, p["w"], preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            if "b" in p:
                out = out + p["b"]
            return out

        def body(h, blk):
            T = h.shape[1]
            x = _ln(h, blk["ln1_w"], blk["ln1_b"], self.eps)
            q = apply(blk["q"], x).reshape(B, T, self.heads, self.hd)
            k = apply(blk["k"], x).reshape(B, T, self.heads, self.hd)
            v = apply(blk["v"], x).reshape(B, T, self.heads, self.hd)
            if self.use_qk_norm:
                # rms over the FULL projection (HF applies q_norm before
                # the head reshape)
                def rn(u, w):
                    uf = u.reshape(B, T, -1).astype(jnp.float32)
                    var = jnp.mean(jnp.square(uf), -1, keepdims=True)
                    return (uf * jax.lax.rsqrt(var + self.eps) *
                            w.astype(jnp.float32)) \
                        .reshape(B, T, self.heads, self.hd) \
                        .astype(u.dtype)
                q = rn(q, blk["qn"])
                k = rn(k, blk["kn"])
            scores = jnp.einsum("bthd,bshd->bhts",
                                q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(self.hd)
            probs = jax.nn.softmax(scores, -1)
            attn = jnp.einsum("bhts,bshd->bthd", probs,
                              v.astype(jnp.float32)) \
                .reshape(B, T, D).astype(self.dtype)
            attn = apply(blk["o"], attn)
            h = h + blk["l1"].astype(self.dtype) * attn
            x = _ln(h, blk["ln2_w"], blk["ln2_b"], self.eps)
            f = apply(blk["fc1"], x)
            f = jax.nn.gelu(f.astype(jnp.float32), approximate=False) \
                .astype(self.dtype)
            f = apply(blk["fc2"], f)
            h = h + blk["l2"].astype(self.dtype) * f
            return h, None

        h, _ = jax.lax.scan(body, h, params["layers"])
        if self.final_ln:
            h = _ln(h, params["fln_w"], params["fln_b"], self.eps)
        return h


@register_model("internvl")
class InternVLForConditionalGeneration(LlamaForCausalLM):
    architectures = ("InternVLForConditionalGeneration",)
    processor_type = "internvl"

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        super().__init__(dataclasses.replace(model_config,
                                             hf_config=text_config))
        self.image_token_id = self.vlm_config.image_token_id
        self.downsample = self.vlm_config.downsample_ratio
        self.tower = InternVLVisionTower(self.vlm_config.vision_config,
                                         self.dtype)
        g = self.tower.grid
        ds = self.downsample
        self.vision_tokens_per_image = int((g * ds) ** 2)
        self._vision_params = None
        self._projector = None
        self._encode_fn = None

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]):
        lm_sd, vis_sd, pj = {}, {}, {}
        for k, v in sd.items():
            k2 = k[len("model."):] if k.startswith("model.") else k
            if k2.startswith("language_model."):
                lm_sd["model." + k2[len("language_model."):]] = v
            elif k2.startswith("vision_tower."):
                vis_sd[k2[len("vision_tower."):]] = v
            elif k2.startswith("multi_modal_projector."):
                pj[k2[len("multi_modal_projector."):]] = v
            elif k2 == "lm_head.weight":
                lm_sd["lm_head.weight"] = v
        dt = self.dtype
        t = lambda n: jnp.asarray(
            np.ascontiguousarray(np.asarray(pj[n]).T), dt)
        self._vision_params = self.tower.load_hf_state_dict(vis_sd)
        self._projector = {
            "ln_w": jnp.asarray(np.asarray(pj["layer_norm.weight"]), dt),
            "ln_b": jnp.asarray(np.asarray(pj["layer_norm.bias"]), dt),
            "l1_w": t("linear_1.weight"),
            "l1_b": jnp.asarray(np.asarray(pj["linear_1.bias"]), dt),
            "l2_w": t("linear_2.weight"),
            "l2_b": jnp.asarray(np.asarray(pj["linear_2.bias"]), dt),
        }
        return super().load_hf_state_dict(lm_sd)

    def init_params(self, rng):
        raise NotImplementedError("internvl requires checkpoint weights")

    def encode_images(self, pixel_values: np.ndarray) -> np.ndarray:
        """[B, 3, H, W] → [B, tokens_per_image, H_text]."""
        if self._encode_fn is None:
            g = self.tower.grid
            ds = self.downsample

            @jax.jit
            def run(vis, proj, px):
                h = self.tower(vis, px)[:, 1:]          # drop CLS
                B = h.shape[0]
                # pixel shuffle (HF double-permute semantics)
                f = h.reshape(B, g, g, -1)
                f = f.reshape(B, g, int(g * ds), int(f.shape[-1] / ds))
                f = f.transpose(0, 2, 1, 3)
                f = f.reshape(B, int(g * ds), int(g * ds),
                              int(h.shape[-1] / (ds * ds)))
                f = f.transpose(0, 2, 1, 3)
                f = f.reshape(B, -1, f.shape[-1])
                f = _ln(f, proj["ln_w"], proj["ln_b"], 1e-5)
                f = jnp.dot(f, proj["l1_w"],
                            preferred_element_type=jnp.float32) + \
                    proj["l1_b"]
                f = jax.nn.gelu(f, approximate=False)
                f = jnp.dot(f.astype(self.dtype), proj["l2_w"],
                            preferred_element_type=jnp.float32) + \
                    proj["l2_b"]
                return f
            self._encode_fn = run
        return np.asarray(self._encode_fn(
            self._vision_params, self._projector,
            jnp.asarray(pixel_values, jnp.float32)), np.float32)


@register_input_processor("internvl")
class InternVLInputProcessor:
    def __init__(self, model):
        self.model = model
        self.image_token = model.image_token_id
        self.tokens_per_image = model.vision_tokens_per_image

    def __call__(self, token_ids: List[int], mm_data: Dict[str, Any]
                 ) -> Tuple[List[int], np.ndarray, str]:
        images = mm_data.get("image") or []
        if not isinstance(images, (list, tuple)):
            images = [images]
        n_ph = sum(1 for t in token_ids if t == self.image_token)
        if n_ph == len(images):
            out_ids: List[int] = []
            for t in token_ids:
                if t == self.image_token:
                    out_ids.extend([self.image_token]
                                   * self.tokens_per_image)
                else:
                    out_ids.append(t)
        else:
            out_ids = list(token_ids)
        feats = self.model.encode_images(
            np.stack([np.asarray(im, np.float32) for im in images]))
        T = len(out_ids)
        embeds = np.full((T, feats.shape[-1]), np.nan, np.float32)
        pos = [i for i, t in enumerate(out_ids) if t == self.image_token]
        expect = len(images) * self.tokens_per_image
        if len(pos) != expect:
            raise ValueError(
                f"prompt has {len(pos)} image tokens, images supply "
                f"{expect} feature rows")
        embeds[np.asarray(pos, np.int64)] = feats.reshape(-1,
                                                          feats.shape[-1])
        return out_ids, embeds, mm_hash([np.asarray(i) for i in images])
