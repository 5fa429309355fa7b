"""GLM-4.5V / GLM-4.6V (glm4v) vision-language model.

Behavioral reference: the reference's GLM multimodal support; HF
modeling_glm4v.py is the numeric spec. Vision: conv3d patch embed +
post-conv RMSNorm, BICUBIC grid-sampled learned position embeddings
(exact numpy port of torch grid_sample a=-0.75, border padding,
align_corners=False), 2D-rotary RMSNorm blocks with swiglu MLPs,
post-LN, a 2x2 conv downsample (a linear over the merge block), and a
proj→LayerNorm→GELU→swiglu merger. Text: GLM-4 (sandwich norms,
partial interleaved rotary) with chunked M-RoPE sections."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.glm import Glm4ForCausalLM
from ..models.modeling_utils import ModelConfig, register_model
from ..ops.norm import rms_norm
from ..ops.rope import mrope_cos_sin, rope_cos_sin
from .processor import mm_hash, register_input_processor
from .qwen2_vl import qwen2vl_rope_index


def _cubic_w(x, a=-0.75):
    ax = np.abs(x)
    return np.where(
        ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
        np.where(ax < 2,
                 a * (ax ** 3 - 5 * ax ** 2 + 8 * ax - 4), 0.0))


def grid_sample_bicubic(img: np.ndarray, xs: np.ndarray,
                        ys: np.ndarray) -> np.ndarray:
    """torch.nn.functional.grid_sample(mode="bicubic",
    padding_mode="border", align_corners=False) for img [H, W, C] at
    float pixel coordinates (already unnormalized)."""
    H, W, C = img.shape
    x0 = np.floor(xs).astype(int)
    y0 = np.floor(ys).astype(int)
    out = np.zeros((xs.shape[0], C), np.float32)
    for dy in range(-1, 3):
        wy = _cubic_w(ys - (y0 + dy))
        yy = np.clip(y0 + dy, 0, H - 1)
        for dx in range(-1, 3):
            wx = _cubic_w(xs - (x0 + dx))
            xx = np.clip(x0 + dx, 0, W - 1)
            out += (wy * wx)[:, None] * img[yy, xx]
    return out


class Glm4vVisionTower:
    def __init__(self, vc, dtype):
        self.vc = vc
        self.dtype = dtype
        self.depth = vc.depth
        self.D = vc.hidden_size
        self.heads = vc.num_heads
        self.hd = self.D // self.heads
        self.merge = vc.spatial_merge_size
        self.patch = vc.patch_size
        self.tpatch = vc.temporal_patch_size
        self.out_dim = vc.out_hidden_size
        self.eps = getattr(vc, "rms_norm_eps", 1e-5)
        self._fns: Dict[int, Any] = {}

    def load_hf_state_dict(self, sd):
        dt = self.dtype
        t = lambda n: jnp.asarray(
            np.ascontiguousarray(np.asarray(sd[n]).T), dt)
        a = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)

        def block(i):
            p = f"blocks.{i}."
            out = {
                "n1": a(p + "norm1.weight"),
                "n2": a(p + "norm2.weight"),
                "qkv_w": t(p + "attn.qkv.weight"),
                "proj_w": t(p + "attn.proj.weight"),
                "gate": t(p + "mlp.gate_proj.weight"),
                "up": t(p + "mlp.up_proj.weight"),
                "down": t(p + "mlp.down_proj.weight"),
            }
            if p + "attn.qkv.bias" in sd:       # attention_bias=True
                out["qkv_b"] = a(p + "attn.qkv.bias")
            return out

        pe = np.asarray(sd["patch_embed.proj.weight"])
        dw = np.asarray(sd["downsample.weight"])    # [out, D, m, m]
        # conv stride=kernel → a linear over the (d, ky, kx) flat block
        dflat = dw.reshape(dw.shape[0], -1).T        # [(D*m*m), out]
        return {
            "patch_w": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dt),
            "patch_b": a("patch_embed.proj.bias"),
            "post_conv_ln": a("post_conv_layernorm.weight"),
            "pos": np.asarray(
                sd["embeddings.position_embedding.weight"], np.float32),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[block(i) for i in range(self.depth)]),
            "post_ln": a("post_layernorm.weight"),
            "down_w": jnp.asarray(dflat, dt),
            "down_b": a("downsample.bias"),
            "m_proj": t("merger.proj.weight"),
            "m_ln_w": a("merger.post_projection_norm.weight"),
            "m_ln_b": a("merger.post_projection_norm.bias"),
            "m_gate": t("merger.gate_proj.weight"),
            "m_up": t("merger.up_proj.weight"),
            "m_down": t("merger.down_proj.weight"),
        }

    def rot_pos_ids(self, grid_thw):
        out = []
        m = self.merge
        for t, h, w in grid_thw:
            hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
            hp = hp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3) \
                .reshape(-1)
            wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
            wp = wp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3) \
                .reshape(-1)
            out.append(np.tile(np.stack([hp, wp], -1), (t, 1)))
        return np.concatenate(out, axis=0)

    def _forward(self, params, patches, pos_rows, cos, sin, seg):
        x = jnp.dot(patches.astype(self.dtype), params["patch_w"],
                    preferred_element_type=jnp.float32) \
            .astype(self.dtype) + params["patch_b"]
        x = rms_norm(x, params["post_conv_ln"], self.eps)
        x = x + pos_rows.astype(self.dtype)
        L = x.shape[0]
        mask = seg[:, None] == seg[None, :]

        def body(x, blk):
            h = rms_norm(x, blk["n1"], self.eps)
            qkv = jnp.dot(h, blk["qkv_w"],
                          preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            if "qkv_b" in blk:
                qkv = qkv + blk["qkv_b"]
            q, kk, v = jnp.split(qkv.reshape(L, 3, self.heads, self.hd)
                                 .transpose(1, 0, 2, 3), 3, axis=0)
            q, kk, v = q[0], kk[0], v[0]

            def rot(u):
                uf = u.astype(jnp.float32)
                u1, u2 = uf[..., :self.hd // 2], uf[..., self.hd // 2:]
                return jnp.concatenate(
                    [u1 * cos[:, None] - u2 * sin[:, None],
                     u2 * cos[:, None] + u1 * sin[:, None]], -1)
            qf, kf = rot(q), rot(kk)
            scores = jnp.einsum("thd,shd->hts", qf, kf) / \
                math.sqrt(self.hd)
            scores = jnp.where(mask[None], scores,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(scores, -1)
            o = jnp.einsum("hts,shd->thd", probs,
                           v.astype(jnp.float32)).reshape(L, self.D)
            o = jnp.dot(o.astype(self.dtype), blk["proj_w"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            x = x + o
            h = rms_norm(x, blk["n2"], self.eps)
            g = jnp.dot(h, blk["gate"],
                        preferred_element_type=jnp.float32)
            u = jnp.dot(h, blk["up"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            f = jnp.dot(jax.nn.silu(g).astype(self.dtype) * u,
                        blk["down"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            return x + f, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = rms_norm(x, params["post_ln"], self.eps)
        # conv downsample over each merge block: rows are merger-block
        # ordered, so the block's (ky, kx) pairs are consecutive; the
        # conv flattens (d, ky, kx) d-major
        m = self.merge
        blkx = x.reshape(-1, m * m, self.D)          # [N, m*m, D]
        blkx = blkx.transpose(0, 2, 1).reshape(-1, self.D * m * m)
        y = jnp.dot(blkx, params["down_w"],
                    preferred_element_type=jnp.float32) + \
            params["down_b"]
        y = y.astype(self.dtype)
        # merger: proj → LayerNorm+GELU → swiglu
        y = jnp.dot(y, params["m_proj"],
                    preferred_element_type=jnp.float32) \
            .astype(self.dtype)
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, -1, keepdims=True)
        var = jnp.var(yf, -1, keepdims=True)
        yn = (yf - mu) * jax.lax.rsqrt(var + 1e-5) * \
            params["m_ln_w"].astype(jnp.float32) + \
            params["m_ln_b"].astype(jnp.float32)
        y = jax.nn.gelu(yn, approximate=False).astype(self.dtype)
        g = jnp.dot(y, params["m_gate"],
                    preferred_element_type=jnp.float32)
        u = jnp.dot(y, params["m_up"],
                    preferred_element_type=jnp.float32) \
            .astype(self.dtype)
        return jnp.dot(jax.nn.silu(g).astype(self.dtype) * u,
                       params["m_down"],
                       preferred_element_type=jnp.float32) \
            .astype(self.dtype)

    def encode(self, params, pixel_values: np.ndarray, grid_thw):
        L = pixel_values.shape[0]
        pos = self.rot_pos_ids(grid_thw)             # [L, 2] (h, w)
        # bicubic grid-sampled position embeddings (HF semantics)
        tab = params["pos"]
        side = int(tab.shape[0] ** 0.5)
        img = tab.reshape(side, side, -1)
        th = np.concatenate([np.full(int(t * h * w), h, np.float32)
                             for t, h, w in grid_thw])
        tw = np.concatenate([np.full(int(t * h * w), w, np.float32)
                             for t, h, w in grid_thw])
        xs = (pos[:, 1] + 0.5) / tw * side - 0.5
        ys = (pos[:, 0] + 0.5) / th * side - 0.5
        pos_rows = grid_sample_bicubic(img, xs, ys)
        inv = 1.0 / (10000.0 ** (np.arange(0, self.hd // 2, 2,
                                           dtype=np.float32)
                                 / (self.hd // 2)))
        emb = (pos[:, :, None] * inv[None, None, :]).reshape(L, -1)
        # attention segments are per FRAME: h*w repeated t times
        # (HF cu_seqlens = repeat_interleave(h*w, t).cumsum())
        seg = np.zeros(L, np.int32)
        off = sid = 0
        for t, h, w in grid_thw:
            for _ in range(int(t)):
                seg[off:off + int(h * w)] = sid
                off += int(h * w)
                sid += 1
        if L not in self._fns:
            self._fns[L] = jax.jit(self._forward)
        return np.asarray(self._fns[L](
            params, jnp.asarray(pixel_values, jnp.float32),
            jnp.asarray(pos_rows), jnp.asarray(np.cos(emb)),
            jnp.asarray(np.sin(emb)), jnp.asarray(seg)), np.float32)


@register_model("glm4v")
class Glm4vForConditionalGeneration(Glm4ForCausalLM):
    architectures = ("Glm4vForConditionalGeneration",)
    processor_type = "glm4v"
    uses_mrope = True

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        super().__init__(dataclasses.replace(model_config,
                                             hf_config=text_config))
        rs = getattr(text_config, "rope_scaling", None) or {}
        self.mrope_section = tuple(rs.get("mrope_section", (8, 12, 12)))
        self.image_token_id = self.vlm_config.image_token_id
        self.tower = Glm4vVisionTower(self.vlm_config.vision_config,
                                      self.dtype)
        self._vision_params = None

    def _base_cos_sin(self, metadata):
        if metadata.positions_mrope is not None:
            return mrope_cos_sin(self.attn_spec.rope,
                                 metadata.positions_mrope,
                                 self.mrope_section)
        return rope_cos_sin(self.attn_spec.rope, metadata.positions)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]):
        lm_sd, vis_sd = {}, {}
        for k, v in sd.items():
            k2 = k[len("model."):] if k.startswith("model.") else k
            if k2.startswith("language_model."):
                lm_sd["model." + k2[len("language_model."):]] = v
            elif k2.startswith("visual."):
                vis_sd[k2[len("visual."):]] = v
            elif k2 == "lm_head.weight":
                lm_sd["lm_head.weight"] = v
        self._vision_params = self.tower.load_hf_state_dict(vis_sd)
        return super().load_hf_state_dict(lm_sd)

    def init_params(self, rng):
        raise NotImplementedError("glm4v requires checkpoint weights")

    def encode_images(self, pixel_values, grid_thw):
        return self.tower.encode(self._vision_params,
                                 np.asarray(pixel_values, np.float32),
                                 grid_thw)


@register_input_processor("glm4v")
class Glm4vInputProcessor:
    """Same placeholder/M-RoPE handling as Qwen2-VL (chunked
    sections)."""

    def __init__(self, model):
        self.model = model
        self.image_token = model.image_token_id
        self.merge = model.tower.merge

    def __call__(self, token_ids: List[int], mm_data: Dict[str, Any]
                 ) -> Tuple[List[int], np.ndarray, str, Dict[str, Any]]:
        images = mm_data.get("image") or []
        if not isinstance(images, (list, tuple)):
            images = [images]
        grids = [tuple(int(x) for x in g)
                 for g in mm_data["image_grid_thw"]]
        m2 = self.merge ** 2
        counts = [int(t * h * w) // m2 for t, h, w in grids]
        n_ph = sum(1 for t in token_ids if t == self.image_token)
        if n_ph == len(images):
            out_ids: List[int] = []
            ii = 0
            for t in token_ids:
                if t == self.image_token:
                    out_ids.extend([self.image_token] * counts[ii])
                    ii += 1
                else:
                    out_ids.append(t)
        else:
            out_ids = list(token_ids)
        feats = [self.model.encode_images(px, [g])
                 for px, g in zip(images, grids)]
        allfeat = np.concatenate(feats, axis=0)
        T = len(out_ids)
        embeds = np.full((T, allfeat.shape[-1]), np.nan, np.float32)
        pos = [i for i, t in enumerate(out_ids)
               if t == self.image_token]
        if len(pos) != len(allfeat):
            raise ValueError(
                f"prompt has {len(pos)} image tokens, images supply "
                f"{len(allfeat)} feature rows")
        embeds[np.asarray(pos, np.int64)] = allfeat
        mp, delta = qwen2vl_rope_index(out_ids, self.image_token, grids,
                                       self.merge)
        return out_ids, embeds, mm_hash([np.asarray(i) for i in images]), \
            {"mrope_positions": mp, "mrope_delta": delta}
