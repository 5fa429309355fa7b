"""Pixtral vision tower + Mistral3 (Mistral Small 3.1) VLM.

Behavioral reference: tensorrt_llm/_torch/models/modeling_pixtral.py +
modeling_mistral.py (Mistral3 path); HF modeling_pixtral.py /
modeling_mistral3.py are the numeric specs. Pixtral ViT: variable-size
images → per-image patch conv (a linear over P*P*3), RMSNorm pre-LN,
2D rope indexed by the row-major (h, w) meshgrid, per-image
block-diagonal attention, silu-gate FFN. Mistral3 projector: RMSNorm →
2x2 patch merger (unfold + linear) → 2-layer GELU projector into the
Mistral LM."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaForCausalLM
from ..models.modeling_utils import ModelConfig, register_model
from ..ops.norm import rms_norm
from .processor import mm_hash, register_input_processor


class PixtralVisionTower:
    def __init__(self, vc, dtype):
        self.vc = vc
        self.dtype = dtype
        self.D = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.hd = getattr(vc, "head_dim", self.D // self.heads)
        self.patch = vc.patch_size
        self.maxp = vc.image_size // vc.patch_size
        self.theta = getattr(vc, "rope_theta", 10000.0)
        self.eps = 1e-5
        self._fns: Dict[int, Any] = {}
        # 2D rope table [maxp*maxp, hd/2]: h rows take even freqs, w
        # columns odd freqs (HF PixtralRotaryEmbedding layout)
        fr = 1.0 / (self.theta ** (np.arange(0, self.hd, 2,
                                             dtype=np.float32) / self.hd))
        h = np.arange(self.maxp, dtype=np.float32)
        fh = np.outer(h, fr[0::2])                    # [maxp, hd/4]
        fw = np.outer(h, fr[1::2])
        tab = np.concatenate(
            [np.broadcast_to(fh[:, None, :],
                             (self.maxp, self.maxp, fh.shape[1])),
             np.broadcast_to(fw[None, :, :],
                             (self.maxp, self.maxp, fw.shape[1]))],
            axis=-1).reshape(self.maxp * self.maxp, self.hd // 2)
        self._rope_tab = tab

    def load_hf_state_dict(self, sd, prefix=""):
        dt = self.dtype
        g = lambda n: np.asarray(sd[prefix + n])
        t = lambda n: jnp.asarray(np.ascontiguousarray(g(n).T), dt)

        def layer(i):
            p = f"transformer.layers.{i}."
            return {
                "attn_norm": jnp.asarray(g(p + "attention_norm.weight"), dt),
                "ffn_norm": jnp.asarray(g(p + "ffn_norm.weight"), dt),
                "q": t(p + "attention.q_proj.weight"),
                "k": t(p + "attention.k_proj.weight"),
                "v": t(p + "attention.v_proj.weight"),
                "o": t(p + "attention.o_proj.weight"),
                "gate": t(p + "feed_forward.gate_proj.weight"),
                "up": t(p + "feed_forward.up_proj.weight"),
                "down": t(p + "feed_forward.down_proj.weight"),
            }

        pc = g("patch_conv.weight")                  # [D, 3, P, P]
        return {
            "patch_w": jnp.asarray(
                pc.reshape(pc.shape[0], -1).T, dt),  # [3*P*P, D]
            "ln_pre": jnp.asarray(g("ln_pre.weight"), dt),
            "layers": jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[layer(i) for i in range(self.layers)]),
        }

    def _forward(self, params, patches, cos, sin, seg):
        x = jnp.dot(patches.astype(self.dtype), params["patch_w"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        x = rms_norm(x, params["ln_pre"], self.eps)
        L = x.shape[0]
        mask = seg[:, None] == seg[None, :]

        def body(x, blk):
            h = rms_norm(x, blk["attn_norm"], self.eps)
            q = jnp.dot(h, blk["q"], preferred_element_type=jnp.float32) \
                .astype(self.dtype).reshape(L, self.heads, self.hd)
            k = jnp.dot(h, blk["k"], preferred_element_type=jnp.float32) \
                .astype(self.dtype).reshape(L, self.heads, self.hd)
            v = jnp.dot(h, blk["v"], preferred_element_type=jnp.float32) \
                .astype(self.dtype).reshape(L, self.heads, self.hd)

            def rot(u):
                uf = u.astype(jnp.float32)
                u1, u2 = uf[..., :self.hd // 2], uf[..., self.hd // 2:]
                return jnp.concatenate(
                    [u1 * cos[:, None] - u2 * sin[:, None],
                     u2 * cos[:, None] + u1 * sin[:, None]], -1)
            qf, kf = rot(q), rot(k)
            scores = jnp.einsum("thd,shd->hts", qf, kf) / \
                math.sqrt(self.hd)
            scores = jnp.where(mask[None], scores,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(scores, -1)
            o = jnp.einsum("hts,shd->thd", probs, v.astype(jnp.float32))
            o = jnp.dot(o.reshape(L, self.heads * self.hd)
                        .astype(self.dtype), blk["o"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            x = x + o
            h = rms_norm(x, blk["ffn_norm"], self.eps)
            gg = jnp.dot(h, blk["gate"],
                         preferred_element_type=jnp.float32)
            uu = jnp.dot(h, blk["up"],
                         preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            f = jnp.dot(jax.nn.silu(gg).astype(self.dtype) * uu,
                        blk["down"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype)
            return x + f, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        return x

    def encode(self, params, images: List[np.ndarray]):
        """images: list of [3, H, W] (H, W multiples of patch) →
        concatenated per-patch features [L, D] in row-major order."""
        P = self.patch
        patch_rows, pos_ids, seg = [], [], []
        for i, im in enumerate(images):
            im = np.asarray(im, np.float32)
            c, H, W = im.shape
            hp, wp = H // P, W // P
            x = im.reshape(c, hp, P, wp, P).transpose(1, 3, 0, 2, 4) \
                .reshape(hp * wp, c * P * P)
            patch_rows.append(x)
            hh, ww = np.meshgrid(np.arange(hp), np.arange(wp),
                                 indexing="ij")
            pos_ids.append((hh * self.maxp + ww).reshape(-1))
            seg.append(np.full(hp * wp, i, np.int32))
        patches = np.concatenate(patch_rows, 0)
        pos = np.concatenate(pos_ids, 0)
        seg = np.concatenate(seg, 0)
        emb = self._rope_tab[pos]
        L = patches.shape[0]
        if L not in self._fns:
            self._fns[L] = jax.jit(self._forward)
        return self._fns[L](params, jnp.asarray(patches),
                            jnp.asarray(np.cos(emb)),
                            jnp.asarray(np.sin(emb)), jnp.asarray(seg))


@register_model("mistral3")
class Mistral3ForConditionalGeneration(LlamaForCausalLM):
    architectures = ("Mistral3ForConditionalGeneration",)
    processor_type = "mistral3"

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        super().__init__(dataclasses.replace(model_config,
                                             hf_config=text_config))
        self.image_token_index = self.vlm_config.image_token_index
        self.spatial_merge = self.vlm_config.spatial_merge_size
        self.tower = PixtralVisionTower(self.vlm_config.vision_config,
                                        self.dtype)
        self._vision_params = None
        self._projector = None

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]):
        lm_sd, vis_sd = {}, {}
        pj = {}
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
            "norm": jnp.asarray(np.asarray(pj["norm.weight"]), dt),
            "merge": t("patch_merger.merging_layer.weight"),
            "l1": {"weight": t("linear_1.weight"),
                   **({"bias": jnp.asarray(pj["linear_1.bias"], dt)}
                      if "linear_1.bias" in pj else {})},
            "l2": {"weight": t("linear_2.weight"),
                   **({"bias": jnp.asarray(pj["linear_2.bias"], dt)}
                      if "linear_2.bias" in pj else {})},
        }
        return super().load_hf_state_dict(lm_sd)

    def init_params(self, rng):
        raise NotImplementedError("mistral3 requires checkpoint weights")

    def encode_images(self, images: List[np.ndarray]) -> np.ndarray:
        """list of [3, H, W] → merged + projected features [n_tok, H]."""
        feats = np.asarray(
            self.tower.encode(self._vision_params, images))
        pj = self._projector
        feats = np.asarray(rms_norm(jnp.asarray(feats), pj["norm"],
                                    self.rms_eps))
        m = self.spatial_merge
        P = self.tower.patch
        merged = []
        off = 0
        for im in images:
            H, W = np.asarray(im).shape[1:]
            hp, wp = H // P, W // P
            f = feats[off:off + hp * wp].reshape(hp, wp, -1)
            d = f.shape[-1]
            # unfold m x m blocks: channel-major within the block
            # (torch unfold layout: [d*m*m] = d-major over block offsets)
            f = f.reshape(hp // m, m, wp // m, m, d) \
                .transpose(0, 2, 4, 1, 3) \
                .reshape((hp // m) * (wp // m), d * m * m)
            merged.append(f)
            off += hp * wp
        x = jnp.asarray(np.concatenate(merged, 0))
        x = jnp.dot(x, self._projector["merge"],
                    preferred_element_type=jnp.float32)
        l1 = self._projector["l1"]
        x = jnp.dot(x.astype(self.dtype), l1["weight"],
                    preferred_element_type=jnp.float32)
        if "bias" in l1:
            x = x + l1["bias"]
        x = jax.nn.gelu(x, approximate=False)
        l2 = self._projector["l2"]
        x = jnp.dot(x.astype(self.dtype), l2["weight"],
                    preferred_element_type=jnp.float32)
        if "bias" in l2:
            x = x + l2["bias"]
        return np.asarray(x, np.float32)


@register_input_processor("mistral3")
class Mistral3InputProcessor:
    """mm_data: ``image`` = list of [3, H, W] arrays with H, W multiples
    of patch*spatial_merge (the HF processor guarantees this)."""

    def __init__(self, model):
        self.model = model
        self.image_token = model.image_token_index

    def __call__(self, token_ids: List[int], mm_data: Dict[str, Any]
                 ) -> Tuple[List[int], np.ndarray, str]:
        images = mm_data.get("image") or []
        if not isinstance(images, (list, tuple)):
            images = [images]
        m = self.model.spatial_merge
        P = self.model.tower.patch
        counts = []
        for im in images:
            H, W = np.asarray(im).shape[1:]
            counts.append((H // P // m) * (W // P // m))
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
        feats = self.model.encode_images(
            [np.asarray(im, np.float32) for im in images])
        T = len(out_ids)
        embeds = np.full((T, feats.shape[-1]), np.nan, np.float32)
        pos = [i for i, t in enumerate(out_ids) if t == self.image_token]
        if len(pos) != len(feats):
            raise ValueError(
                f"prompt has {len(pos)} image tokens, images supply "
                f"{len(feats)} feature rows")
        embeds[np.asarray(pos, np.int64)] = feats
        return out_ids, embeds, mm_hash([np.asarray(i) for i in images])
