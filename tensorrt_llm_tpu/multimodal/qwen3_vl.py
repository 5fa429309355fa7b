"""Qwen3-VL: interleaved M-RoPE + deepstack vision features.

Behavioral reference: tensorrt_llm/_torch/models/modeling_qwen3vl.py;
HF modeling_qwen3_vl.py is the numeric spec. Vs Qwen2-VL:

  * Vision: ViT with a LEARNED position table bilinearly interpolated
    to each grid (fast_pos_embed_interpolate), 2D rotary, per-image
    full attention, LayerNorm blocks, tanh-GELU MLP; the main patch
    merger plus per-index DEEPSTACK mergers whose features are ADDED to
    the LM's hidden states after early layers at image positions.
  * Text: Qwen3 (per-head qk norms) with INTERLEAVED M-RoPE — frequency
    dims laid out [T H W T H W ... T T] instead of chunked sections.

Deepstack features ride extra columns of the prompt-embeds transfer
(model.prompt_embeds_width = H·(1+n_deepstack)); the llama scan adds
slice k after layer k."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.modeling_utils import ModelConfig, register_model
from ..models.qwen import Qwen3ForCausalLM
from ..models.qwen_moe import Qwen3MoeForCausalLM as _Qwen3MoeBaseForVL
from ..ops.rope import compute_inv_freq
from .processor import mm_hash, register_input_processor
from .qwen2_vl import Qwen2VLInputProcessor, qwen2vl_rope_index


def mrope_cos_sin_interleaved(cfg, positions3, sections):
    """Qwen3-VL interleaved M-RoPE: start from the temporal stream and
    overwrite H at dims (1, 4, …, 3·sections[1]−2) and W at dims
    (2, 5, …, 3·sections[2]−1) (HF apply_interleaved_mrope)."""
    inv_freq = compute_inv_freq(cfg)
    angles3 = positions3.astype(jnp.float32)[:, :, None] * \
        inv_freq[None, None, :]                       # [3, T, rot/2]
    angles = angles3[0]
    rot = angles.shape[-1]
    for dim, offset in ((1, 1), (2, 2)):
        idx = np.arange(offset, sections[dim] * 3, 3)
        idx = idx[idx < rot]
        angles = angles.at[:, idx].set(angles3[dim][:, idx])
    return jnp.cos(angles), jnp.sin(angles)


class Qwen3VisionTower:
    def __init__(self, vc, dtype):
        self.vc = vc
        self.dtype = dtype
        self.depth = vc.depth
        self.embed = vc.hidden_size
        self.heads = vc.num_heads
        self.hd = self.embed // self.heads
        self.merge = vc.spatial_merge_size
        self.patch = vc.patch_size
        self.tpatch = vc.temporal_patch_size
        self.out_dim = vc.out_hidden_size
        self.grid_side = int(vc.num_position_embeddings ** 0.5)
        self.ds_idx = list(vc.deepstack_visual_indexes)
        self._fns: Dict[Any, Any] = {}

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
                "fc1_w": t(p + "mlp.linear_fc1.weight"),
                "fc1_b": a(p + "mlp.linear_fc1.bias"),
                "fc2_w": t(p + "mlp.linear_fc2.weight"),
                "fc2_b": a(p + "mlp.linear_fc2.bias"),
            }

        def merger(pfx, post):
            return {
                "n_w": a(pfx + ".norm.weight"),
                "n_b": a(pfx + ".norm.bias"),
                "fc1_w": t(pfx + ".linear_fc1.weight"),
                "fc1_b": a(pfx + ".linear_fc1.bias"),
                "fc2_w": t(pfx + ".linear_fc2.weight"),
                "fc2_b": a(pfx + ".linear_fc2.bias"),
            }

        pe = np.asarray(sd["patch_embed.proj.weight"])
        out = {
            "patch_w": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dt),
            "patch_b": a("patch_embed.proj.bias"),
            "pos": a("pos_embed.weight"),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[block(i) for i in range(self.depth)]),
            "merger": merger("merger", False),
        }
        for j in range(len(self.ds_idx)):
            out[f"ds_merger{j}"] = merger(f"deepstack_merger_list.{j}",
                                          True)
        return out

    def _ln(self, x, w, b, eps=1e-6):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps) *
                w.astype(jnp.float32) + b.astype(jnp.float32)) \
            .astype(x.dtype)

    def _merge(self, m, x, post):
        """Patch merger: norm (pre- or post-shuffle) → fc1 → GELU → fc2."""
        D = self.embed
        u = self.merge * self.merge
        if post:
            x = x.reshape(-1, u * D)
            x = self._ln(x, m["n_w"], m["n_b"])
        else:
            x = self._ln(x, m["n_w"], m["n_b"]).reshape(-1, u * D)
        x = jnp.dot(x, m["fc1_w"],
                    preferred_element_type=jnp.float32) + m["fc1_b"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x.astype(self.dtype), m["fc2_w"],
                    preferred_element_type=jnp.float32) + m["fc2_b"]
        return x.astype(self.dtype)

    def pos_embed_rows(self, params, grid_thw):
        """numpy port of fast_pos_embed_interpolate (merger-block
        ordering)."""
        tab = np.asarray(params["pos"], np.float32)
        side = self.grid_side
        m = self.merge
        rows = []
        for t, h, w in grid_thw:
            hi = np.linspace(0, side - 1, h)
            wi = np.linspace(0, side - 1, w)
            hf, wf = hi.astype(int), wi.astype(int)
            hc = np.clip(hf + 1, None, side - 1)
            wc = np.clip(wf + 1, None, side - 1)
            dh, dw = hi - hf, wi - wf
            pe = (tab[(hf[:, None] * side + wf[None, :])] *
                  ((1 - dh)[:, None, None] * (1 - dw)[None, :, None]) +
                  tab[(hf[:, None] * side + wc[None, :])] *
                  ((1 - dh)[:, None, None] * dw[None, :, None]) +
                  tab[(hc[:, None] * side + wf[None, :])] *
                  (dh[:, None, None] * (1 - dw)[None, :, None]) +
                  tab[(hc[:, None] * side + wc[None, :])] *
                  (dh[:, None, None] * dw[None, :, None]))
            pe = np.tile(pe.reshape(h * w, -1), (t, 1))
            pe = pe.reshape(t, h // m, m, w // m, m, -1) \
                .transpose(0, 1, 3, 2, 4, 5).reshape(t * h * w, -1)
            rows.append(pe)
        return np.concatenate(rows, axis=0)

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
            pos = np.stack([hp, wp], axis=-1)
            out.append(np.tile(pos, (t, 1)))
        return np.concatenate(out, axis=0)

    def _forward(self, params, patches, pos_rows, cos, sin, seg):
        x = jnp.dot(patches.astype(self.dtype), params["patch_w"],
                    preferred_element_type=jnp.float32) \
            .astype(self.dtype) + params["patch_b"]
        x = x + pos_rows.astype(self.dtype)
        L = x.shape[0]
        mask = seg[:, None] == seg[None, :]
        ds_feats = []
        for i in range(self.depth):
            blk = jax.tree.map(lambda a_: a_[i], params["blocks"])
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
            f = jax.nn.gelu(f, approximate=True)
            f = jnp.dot(f.astype(self.dtype), blk["fc2_w"],
                        preferred_element_type=jnp.float32) \
                .astype(self.dtype) + blk["fc2_b"]
            x = x + f
            if i in self.ds_idx:
                j = self.ds_idx.index(i)
                ds_feats.append(self._merge(params[f"ds_merger{j}"], x,
                                            post=True))
        main = self._merge(params["merger"], x, post=False)
        return main, ds_feats

    def encode(self, params, pixel_values: np.ndarray, grid_thw):
        L = pixel_values.shape[0]
        pos_rows = self.pos_embed_rows(params, grid_thw)
        pos = self.rot_pos_ids(grid_thw)
        inv = 1.0 / (10000.0 ** (np.arange(0, self.hd // 2, 2,
                                           dtype=np.float32)
                                 / (self.hd // 2)))
        emb = (pos[:, :, None] * inv[None, None, :]).reshape(L, -1)
        seg = np.zeros(L, np.int32)
        off = 0
        for i, (t, h, w) in enumerate(grid_thw):
            n = int(t * h * w)
            seg[off:off + n] = i
            off += n
        if L not in self._fns:
            self._fns[L] = jax.jit(self._forward)
        main, ds = self._fns[L](params,
                                jnp.asarray(pixel_values, jnp.float32),
                                jnp.asarray(pos_rows),
                                jnp.asarray(np.cos(emb)),
                                jnp.asarray(np.sin(emb)),
                                jnp.asarray(seg))
        return np.asarray(main), [np.asarray(d) for d in ds]


class _Qwen3VLGlue:
    """Vision/M-RoPE glue shared by the dense and MoE Qwen3-VL models
    (mixed into the respective text LM classes)."""
    processor_type = "qwen3_vl"
    uses_mrope = True

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        super().__init__(dataclasses.replace(model_config,
                                             hf_config=text_config))
        rs = getattr(text_config, "rope_scaling", None) or {}
        self.mrope_section = tuple(rs.get("mrope_section", (24, 20, 20)))
        self.image_token_id = self.vlm_config.image_token_id
        self.tower = Qwen3VisionTower(self.vlm_config.vision_config,
                                      self.dtype)
        self.n_deepstack = len(self.tower.ds_idx)
        self.prompt_embeds_width = self.hidden_size * \
            (1 + self.n_deepstack)
        self._vision_params = None

    def _base_cos_sin(self, metadata):
        from ..ops.rope import rope_cos_sin
        if metadata.positions_mrope is not None:
            return mrope_cos_sin_interleaved(self.attn_spec.rope,
                                             metadata.positions_mrope,
                                             self.mrope_section)
        return rope_cos_sin(self.attn_spec.rope, metadata.positions)

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, **kw):
        ds = None
        if input_embeds is not None and \
                input_embeds.shape[-1] > self.hidden_size:
            H = self.hidden_size
            wide = input_embeds
            input_embeds = wide[:, :H]
            T = wide.shape[0]
            ds = jnp.nan_to_num(
                wide[:, H:]).reshape(T, self.n_deepstack, H) \
                .transpose(1, 0, 2)
        return super().forward(params, token_ids, kv_pages, metadata,
                               input_embeds=input_embeds,
                               deepstack=ds, **kw)

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
        raise NotImplementedError("qwen3_vl requires checkpoint weights")

    def encode_images(self, pixel_values, grid_thw):
        return self.tower.encode(self._vision_params,
                                 np.asarray(pixel_values, np.float32),
                                 grid_thw)


@register_input_processor("qwen3_vl")
class Qwen3VLInputProcessor:
    """Like Qwen2-VL, plus deepstack feature columns packed beside the
    spliced main features (zeros on text rows: additive identity)."""

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
        feats, ds_all = [], []
        for px, g in zip(images, grids):
            main, ds = self.model.encode_images(px, [g])
            feats.append(main)
            ds_all.append(np.stack(ds, axis=1))   # [n_tok, n_ds, H]
        allfeat = np.concatenate(feats, axis=0)
        allds = np.concatenate(ds_all, axis=0)
        T = len(out_ids)
        H = allfeat.shape[-1]
        nds = allds.shape[1]
        embeds = np.zeros((T, H * (1 + nds)), np.float32)
        embeds[:, :H] = np.nan
        pos = [i for i, t in enumerate(out_ids)
               if t == self.image_token]
        if len(pos) != len(allfeat):
            raise ValueError(
                f"prompt has {len(pos)} image tokens, images supply "
                f"{len(allfeat)} feature rows")
        posa = np.asarray(pos, np.int64)
        embeds[posa, :H] = allfeat
        embeds[posa, H:] = allds.reshape(len(allfeat), nds * H)
        mp, delta = qwen2vl_rope_index(out_ids, self.image_token, grids,
                                       self.merge)
        return out_ids, embeds, mm_hash([np.asarray(i) for i in images]), \
            {"mrope_positions": mp, "mrope_delta": delta}


@register_model("qwen3_vl")
class Qwen3VLForConditionalGeneration(_Qwen3VLGlue, Qwen3ForCausalLM):
    architectures = ("Qwen3VLForConditionalGeneration",)


@register_model("qwen3_vl_moe")
class Qwen3VLMoeForConditionalGeneration(_Qwen3VLGlue,
                                         _Qwen3MoeBaseForVL):
    """Qwen3-VL-MoE: same tower/deepstack/M-RoPE glue over the
    Qwen3-MoE text model (the mixtral scan carries the deepstack
    hook). The checkpoint stores FUSED per-expert tensors
    (gate_up_proj [E, H, 2I] chunked gate|up, down_proj [E, I, H]) —
    unfused at load onto the qwen_moe naming."""
    architectures = ("Qwen3VLMoeForConditionalGeneration",)

    def load_hf_state_dict(self, sd):
        sd = dict(sd)
        for k in list(sd):
            if k.endswith("mlp.experts.gate_up_proj"):
                gu = np.asarray(sd.pop(k))        # [E, H, 2I]
                I = gu.shape[-1] // 2
                base = k[:-len("gate_up_proj")]
                for e in range(gu.shape[0]):
                    sd[base + f"{e}.gate_proj.weight"] = \
                        np.ascontiguousarray(gu[e, :, :I].T)
                    sd[base + f"{e}.up_proj.weight"] = \
                        np.ascontiguousarray(gu[e, :, I:].T)
            elif k.endswith("mlp.experts.down_proj"):
                dn = np.asarray(sd.pop(k))        # [E, I, H]
                base = k[:-len("down_proj")]
                for e in range(dn.shape[0]):
                    sd[base + f"{e}.down_proj.weight"] = \
                        np.ascontiguousarray(dn[e].T)
        return super().load_hf_state_dict(sd)
