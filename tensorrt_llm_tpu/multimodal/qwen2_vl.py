"""Qwen2-VL: M-RoPE vision-language model.

Behavioral reference: tensorrt_llm/_torch/models/modeling_qwen2vl.py;
HF modeling_qwen2_vl.py is the numeric spec. Three pieces:

  * LANGUAGE model: Qwen2 with M-RoPE — rope frequency dims split into
    ``mrope_section`` (temporal/height/width); text tokens use equal
    positions on all three axes, image tokens use their (t, h, w) grid
    coordinates. 3-axis positions ride ``metadata.positions_mrope``
    (engine plumbs them host-side; decode rows advance all axes
    together from the request's ``mrope_delta``).
  * VISION tower: ViT over flattened patch sequences — conv3d patch
    embed (a linear over the flattened patch), 2D rotary embeddings
    from the (h, w) grid, per-image block-diagonal full attention
    (cu_seqlens), LayerNorm blocks with quick-GELU MLP, and a 2x2
    spatial patch merger into the LM width.
  * INPUT processor: expands image placeholders to merged-patch counts,
    computes the 3-axis rope grid + delta (HF get_rope_index), and
    returns NaN-masked prompt embeddings.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.modeling_utils import ModelConfig, register_model
from ..models.qwen import Qwen2ForCausalLM
from .processor import mm_hash, register_input_processor


# ---------------------------------------------------------------------- #
# Vision tower (functional)
# ---------------------------------------------------------------------- #
class Qwen2VisionTower:
    def __init__(self, vc, dtype):
        self.vc = vc
        self.dtype = dtype
        self.depth = vc.depth
        self.embed = vc.embed_dim
        self.heads = vc.num_heads
        self.hd = self.embed // self.heads
        self.merge = vc.spatial_merge_size
        self.patch = vc.patch_size
        self.tpatch = vc.temporal_patch_size
        self.out_dim = vc.hidden_size
        self._fns: Dict[int, Any] = {}

    def load_hf_state_dict(self, sd):
        dt = self.dtype
        t = lambda n: jnp.asarray(
            np.ascontiguousarray(np.asarray(sd[n]).T), dt)
        a = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)

        def block(i):
            p = f"blocks.{i}."
            return {
                "ln1_w": a(p + "norm1.weight"), "ln1_b": a(p + "norm1.bias"),
                "ln2_w": a(p + "norm2.weight"), "ln2_b": a(p + "norm2.bias"),
                "qkv_w": t(p + "attn.qkv.weight"),
                "qkv_b": a(p + "attn.qkv.bias"),
                "proj_w": t(p + "attn.proj.weight"),
                "proj_b": a(p + "attn.proj.bias"),
                "fc1_w": t(p + "mlp.fc1.weight"), "fc1_b": a(p + "mlp.fc1.bias"),
                "fc2_w": t(p + "mlp.fc2.weight"), "fc2_b": a(p + "mlp.fc2.bias"),
            }

        pe = np.asarray(sd["patch_embed.proj.weight"])  # [E, C, t, p, p]
        return {
            "patch_w": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dt),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[block(i) for i in range(self.depth)]),
            "ln_q_w": a("merger.ln_q.weight"),
            "ln_q_b": a("merger.ln_q.bias"),
            "m0_w": t("merger.mlp.0.weight"), "m0_b": a("merger.mlp.0.bias"),
            "m2_w": t("merger.mlp.2.weight"), "m2_b": a("merger.mlp.2.bias"),
        }

    def rot_pos_ids(self, grid_thw) -> np.ndarray:
        """Per-patch (h, w) rotary positions in merger-block order
        (HF rot_pos_emb)."""
        out = []
        m = self.merge
        for t, h, w in grid_thw:
            hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
            hp = hp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3) \
                .reshape(-1)
            wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
            wp = wp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3) \
                .reshape(-1)
            pos = np.stack([hp, wp], axis=-1)
            out.append(np.tile(pos, (t, 1)))
        return np.concatenate(out, axis=0)       # [L, 2]

    def _ln(self, x, w, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) *
                w.astype(jnp.float32) + b.astype(jnp.float32)) \
            .astype(x.dtype)

    def _forward(self, params, patches, cos, sin, seg_ids):
        x = jnp.dot(patches.astype(self.dtype), params["patch_w"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        L = x.shape[0]
        mask = seg_ids[:, None] == seg_ids[None, :]

        def body(x, blk):
            h = self._ln(x, blk["ln1_w"], blk["ln1_b"])
            qkv = jnp.dot(h, blk["qkv_w"],
                          preferred_element_type=jnp.float32) \
                .astype(self.dtype) + blk["qkv_b"]
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
                           v.astype(jnp.float32)).reshape(L, self.embed)
            o = jnp.dot(o.astype(self.dtype), blk["proj_w"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype) + blk["proj_b"]
            x = x + o
            h = self._ln(x, blk["ln2_w"], blk["ln2_b"])
            f = jnp.dot(h, blk["fc1_w"],
                        preferred_element_type=jnp.float32) + blk["fc1_b"]
            f = f * jax.nn.sigmoid(1.702 * f)      # quick_gelu
            f = jnp.dot(f.astype(self.dtype), blk["fc2_w"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype) + blk["fc2_b"]
            return x + f, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        # merger: ln_q then 2x2 spatial groups -> MLP to LM width
        x = self._ln(x, params["ln_q_w"], params["ln_q_b"])
        x = x.reshape(-1, self.merge * self.merge * self.embed)
        x = jnp.dot(x, params["m0_w"],
                    preferred_element_type=jnp.float32) + params["m0_b"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x.astype(self.dtype), params["m2_w"],
                    preferred_element_type=jnp.float32) + params["m2_b"]
        return x.astype(self.dtype)

    def encode(self, params, pixel_values: np.ndarray, grid_thw):
        """pixel_values [L, C*t*p*p] + grid list → [L/merge^2, out]."""
        L = pixel_values.shape[0]
        pos = self.rot_pos_ids(grid_thw)
        inv = 1.0 / (10000.0 ** (np.arange(0, self.hd // 2, 2,
                                           dtype=np.float32)
                                 / (self.hd // 2)))
        freqs = pos[:, :, None] * inv[None, None, :]     # [L, 2, hd/4]
        emb = freqs.reshape(L, -1)                        # [L, hd/2]
        cos, sin = np.cos(emb), np.sin(emb)
        seg = np.zeros(L, np.int32)
        off = 0
        for i, (t, h, w) in enumerate(grid_thw):
            n = int(t * h * w)
            seg[off:off + n] = i
            off += n
        if L not in self._fns:
            self._fns[L] = jax.jit(self._forward)
        return self._fns[L](params, jnp.asarray(pixel_values),
                            jnp.asarray(cos), jnp.asarray(sin),
                            jnp.asarray(seg))


# ---------------------------------------------------------------------- #
@register_model("qwen2_vl")
class Qwen2VLForConditionalGeneration(Qwen2ForCausalLM):
    architectures = ("Qwen2VLForConditionalGeneration",)
    processor_type = "qwen2_vl"
    uses_mrope = True
    tower_cls = Qwen2VisionTower

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        lm_config = dataclasses.replace(model_config,
                                        hf_config=text_config)
        super().__init__(lm_config)
        rs = getattr(text_config, "rope_scaling", None) or {}
        self.mrope_section = tuple(rs.get("mrope_section",
                                          (self.head_dim // 2,)))
        self.image_token_id = self.vlm_config.image_token_id
        self.vision_start_token_id = getattr(
            self.vlm_config, "vision_start_token_id", None)
        self.tower = self.tower_cls(self.vlm_config.vision_config,
                                    self.dtype)
        self._vision_params = None

    def _base_cos_sin(self, metadata):
        from ..ops.rope import mrope_cos_sin, rope_cos_sin
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
        raise NotImplementedError(
            "qwen2_vl requires checkpoint weights")

    def encode_images(self, pixel_values, grid_thw):
        return self.tower.encode(self._vision_params,
                                 np.asarray(pixel_values, np.float32),
                                 grid_thw)


# ---------------------------------------------------------------------- #
def qwen2vl_rope_index(token_ids: List[int], image_token_id: int,
                       grids: List[Tuple[int, int, int]], merge: int
                       ) -> Tuple[np.ndarray, int]:
    """HF Qwen2VLModel.get_rope_index for one pre-expanded sequence of
    image placeholders: returns ([3, T] positions, delta)."""
    T = len(token_ids)
    pos = np.zeros((3, T), np.int64)
    st = 0
    st_idx = 0
    img_i = 0
    toks = list(token_ids)
    while img_i < len(grids):
        try:
            ed = toks.index(image_token_id, st)
        except ValueError:
            break
        t, h, w = grids[img_i]
        gh, gw = h // merge, w // merge
        text_len = ed - st
        for j in range(3):
            pos[j, st:ed] = np.arange(text_len) + st_idx
        ti = np.repeat(np.arange(t), gh * gw)
        hi = np.tile(np.repeat(np.arange(gh), gw), t)
        wi = np.tile(np.arange(gw), t * gh)
        n = t * gh * gw
        pos[0, ed:ed + n] = ti + text_len + st_idx
        pos[1, ed:ed + n] = hi + text_len + st_idx
        pos[2, ed:ed + n] = wi + text_len + st_idx
        st_idx = int(pos[:, st:ed + n].max()) + 1 if ed + n > st else st_idx
        st = ed + n
        img_i += 1
    if st < T:
        text_len = T - st
        for j in range(3):
            pos[j, st:] = np.arange(text_len) + st_idx
    delta = int(pos.max()) + 1 - T
    return pos.astype(np.int32), delta


@register_input_processor("qwen2_vl")
class Qwen2VLInputProcessor:
    """mm_data: ``image`` = list of flattened-patch arrays
    [n_patches, C*t*p*p]; ``image_grid_thw`` = [(t, h, w), ...]."""

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
        # expand one placeholder per image when not pre-expanded
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
        feats = [np.asarray(self.model.encode_images(px, [g]))
                 for px, g in zip(images, grids)]
        allfeat = np.concatenate(feats, axis=0)
        T = len(out_ids)
        embeds = np.full((T, allfeat.shape[-1]), np.nan, np.float32)
        posns = [i for i, t in enumerate(out_ids)
                 if t == self.image_token]
        if len(posns) != len(allfeat):
            raise ValueError(
                f"prompt has {len(posns)} image tokens, images supply "
                f"{len(allfeat)} feature rows")
        embeds[np.asarray(posns, np.int64)] = allfeat
        mp, delta = qwen2vl_rope_index(out_ids, self.image_token, grids,
                                       self.merge)
        return out_ids, embeds, mm_hash([np.asarray(i) for i in images]), \
            {"mrope_positions": mp, "mrope_delta": delta}


# ---------------------------------------------------------------------- #
# Qwen2.5-VL: window attention + RMSNorm + silu-gate MLP in the tower
# (reference: modeling_qwen2_5_vl.py; LM/M-RoPE unchanged for images)
# ---------------------------------------------------------------------- #
class Qwen25VisionTower(Qwen2VisionTower):
    def __init__(self, vc, dtype):
        vc.embed_dim = vc.hidden_size          # 2.5 renames the width
        super().__init__(vc, dtype)
        self.out_dim = vc.out_hidden_size
        self.window = vc.window_size
        self.full_idx = set(vc.fullatt_block_indexes)

    def load_hf_state_dict(self, sd):
        dt = self.dtype
        t = lambda n: jnp.asarray(
            np.ascontiguousarray(np.asarray(sd[n]).T), dt)
        a = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)

        def block(i):
            p = f"blocks.{i}."
            return {
                "ln1_w": a(p + "norm1.weight"),
                "ln2_w": a(p + "norm2.weight"),
                "qkv_w": t(p + "attn.qkv.weight"),
                "qkv_b": a(p + "attn.qkv.bias"),
                "proj_w": t(p + "attn.proj.weight"),
                "proj_b": a(p + "attn.proj.bias"),
                "gate_w": t(p + "mlp.gate_proj.weight"),
                "gate_b": a(p + "mlp.gate_proj.bias"),
                "up_w": t(p + "mlp.up_proj.weight"),
                "up_b": a(p + "mlp.up_proj.bias"),
                "down_w": t(p + "mlp.down_proj.weight"),
                "down_b": a(p + "mlp.down_proj.bias"),
                "is_full": jnp.asarray(i in self.full_idx),
            }

        pe = np.asarray(sd["patch_embed.proj.weight"])
        return {
            "patch_w": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dt),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[block(i) for i in range(self.depth)]),
            "ln_q_w": a("merger.ln_q.weight"),
            "m0_w": t("merger.mlp.0.weight"), "m0_b": a("merger.mlp.0.bias"),
            "m2_w": t("merger.mlp.2.weight"), "m2_b": a("merger.mlp.2.bias"),
        }

    def _rms(self, x, w):
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), -1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + 1e-6) * w.astype(jnp.float32)) \
            .astype(x.dtype)

    def get_window_index(self, grid_thw):
        """numpy port of HF get_window_index: window-major permutation of
        merge groups + per-window cumulative lengths."""
        m = self.merge
        vmw = self.window // m // self.patch
        unit = m * m
        win_idx, cu = [], [0]
        base = 0
        for t, h, w in grid_thw:
            gh, gw = h // m, w // m
            idx = np.arange(t * gh * gw).reshape(t, gh, gw)
            ph = (-gh) % vmw
            pw = (-gw) % vmw
            idxp = np.full((t, gh + ph, gw + pw), -100, np.int64)
            idxp[:, :gh, :gw] = idx
            nh, nw = (gh + ph) // vmw, (gw + pw) // vmw
            idxp = idxp.reshape(t, nh, vmw, nw, vmw) \
                .transpose(0, 1, 3, 2, 4).reshape(t, nh * nw, vmw, vmw)
            seqlens = (idxp != -100).sum((2, 3)).reshape(-1)
            flat = idxp.reshape(-1)
            keep = flat[flat != -100]
            win_idx.append(keep + base)
            cu.extend((np.cumsum(seqlens) * unit + cu[-1]).tolist())
            base += t * gh * gw
        cu = np.asarray(cu, np.int64)
        cu = cu[np.concatenate([[True], np.diff(cu) != 0])]
        return np.concatenate(win_idx), cu

    def _forward(self, params, patches, cos, sin, seg_full, seg_win):
        x = jnp.dot(patches.astype(self.dtype), params["patch_w"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        L = x.shape[0]
        mask_full = seg_full[:, None] == seg_full[None, :]
        mask_win = seg_win[:, None] == seg_win[None, :]

        def body(x, blk):
            mask = jnp.where(blk["is_full"], mask_full, mask_win)
            h = self._rms(x, blk["ln1_w"])
            qkv = jnp.dot(h, blk["qkv_w"],
                          preferred_element_type=jnp.float32) \
                .astype(self.dtype) + blk["qkv_b"]
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
                           v.astype(jnp.float32)).reshape(L, self.embed)
            o = jnp.dot(o.astype(self.dtype), blk["proj_w"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype) + blk["proj_b"]
            x = x + o
            h = self._rms(x, blk["ln2_w"])
            g = jnp.dot(h, blk["gate_w"],
                        preferred_element_type=jnp.float32) + blk["gate_b"]
            u = (jnp.dot(h, blk["up_w"],
                         preferred_element_type=jnp.float32)
                 + blk["up_b"]).astype(self.dtype)
            f = (jax.nn.silu(g).astype(self.dtype) * u)
            f = jnp.dot(f, blk["down_w"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype) + blk["down_b"]
            return x + f, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = self._rms(x, params["ln_q_w"])
        x = x.reshape(-1, self.merge * self.merge * self.embed)
        x = jnp.dot(x, params["m0_w"],
                    preferred_element_type=jnp.float32) + params["m0_b"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x.astype(self.dtype), params["m2_w"],
                    preferred_element_type=jnp.float32) + params["m2_b"]
        return x.astype(self.dtype)

    def encode(self, params, pixel_values: np.ndarray, grid_thw):
        L = pixel_values.shape[0]
        unit = self.merge * self.merge
        pos = self.rot_pos_ids(grid_thw)
        inv = 1.0 / (10000.0 ** (np.arange(0, self.hd // 2, 2,
                                           dtype=np.float32)
                                 / (self.hd // 2)))
        freqs = pos[:, :, None] * inv[None, None, :]
        emb = freqs.reshape(L, -1)
        win_idx, cu_win = self.get_window_index(grid_thw)
        # permute merge-groups into window-major order
        perm = (win_idx[:, None] * unit +
                np.arange(unit)[None, :]).reshape(-1)
        px = np.asarray(pixel_values, np.float32)[perm]
        emb = emb[perm]
        cos, sin = np.cos(emb), np.sin(emb)
        seg_full = np.zeros(L, np.int32)
        off = 0
        for i, (t, h, w) in enumerate(grid_thw):
            n = int(t * h * w)
            seg_full[off:off + n] = i
            off += n
        seg_full = seg_full[perm]
        seg_win = np.zeros(L, np.int32)
        for i in range(len(cu_win) - 1):
            seg_win[cu_win[i]:cu_win[i + 1]] = i
        key = (L, "w25")
        if key not in self._fns:
            self._fns[key] = jax.jit(self._forward)
        out = self._fns[key](params, jnp.asarray(px), jnp.asarray(cos),
                             jnp.asarray(sin), jnp.asarray(seg_full),
                             jnp.asarray(seg_win))
        inv_perm = np.argsort(win_idx)
        return np.asarray(out)[inv_perm]


@register_model("qwen2_5_vl")
class Qwen25VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    architectures = ("Qwen2_5_VLForConditionalGeneration",)
    processor_type = "qwen2_vl"       # same placeholder/M-RoPE handling
    tower_cls = Qwen25VisionTower
