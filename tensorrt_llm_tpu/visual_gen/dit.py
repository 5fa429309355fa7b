"""Generic DiT denoiser (reference: _torch/visual_gen/models — the
WAN/LTX2/Cosmos transformers share this shape: patchified latent +
timestep-conditioned transformer blocks with adaLN modulation +
unpatchify; Peebles & Xie DiT).

TPU-first: the whole model is one jittable function over static
shapes; blocks ride a lax.scan over stacked layer params so the graph
holds ONE block regardless of depth (same design as the LLM side)."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    latent_size: int = 32          # H=W of the latent grid
    latent_channels: int = 4
    patch: int = 2
    hidden: int = 256
    depth: int = 6
    heads: int = 4
    cond_dim: int = 256            # text/class conditioning width
    dtype: Any = jnp.bfloat16

    @property
    def tokens(self) -> int:
        return (self.latent_size // self.patch) ** 2

    @property
    def patch_dim(self) -> int:
        return self.latent_channels * self.patch * self.patch


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal timestep embedding (the diffusion standard)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class DiTDenoiser:
    def __init__(self, config: DiTConfig):
        self.cfg = config

    def init_params(self, key) -> Dict[str, Any]:
        c = self.cfg
        ks = jax.random.split(key, 16)
        d = c.hidden

        def lin(k, i, o, scale=0.02):
            return jax.random.normal(k, (i, o), jnp.float32) * scale

        L = c.depth
        lk = jax.random.split(ks[0], 8)
        layers = {
            # adaLN modulation: 6 gates/shifts/scales per block from t
            "mod": jax.random.normal(lk[0], (L, d, 6 * d),
                                     jnp.float32) * 0.001,
            "qkv": jax.random.normal(lk[1], (L, d, 3 * d),
                                     jnp.float32) * 0.02,
            "proj": jax.random.normal(lk[2], (L, d, d),
                                      jnp.float32) * 0.02,
            "fc1": jax.random.normal(lk[3], (L, d, 4 * d),
                                     jnp.float32) * 0.02,
            "fc2": jax.random.normal(lk[4], (L, 4 * d, d),
                                     jnp.float32) * 0.02,
        }
        return {
            "patch_in": lin(ks[1], c.patch_dim, d),
            "pos": jax.random.normal(ks[2], (c.tokens, d),
                                     jnp.float32) * 0.02,
            "t_mlp1": lin(ks[3], 256, d),
            "t_mlp2": lin(ks[4], d, d),
            "cond_in": lin(ks[5], c.cond_dim, d),
            "layers": layers,
            "final_mod": lin(ks[6], d, 2 * d, 0.001),
            "patch_out": lin(ks[7], d, c.patch_dim, 0.001),
        }

    def patchify(self, x: jax.Array) -> jax.Array:
        """[B, H, W, C] -> [B, T, patch_dim]"""
        c = self.cfg
        B, H, W, C = x.shape
        p = c.patch
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, (H // p) * (W // p), p * p * C)

    def unpatchify(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        B, T, _ = x.shape
        g = c.latent_size // c.patch
        p = c.patch
        x = x.reshape(B, g, g, p, p, c.latent_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, c.latent_size, c.latent_size,
                         c.latent_channels)

    def __call__(self, params, x_latent: jax.Array, t: jax.Array,
                 cond: Optional[jax.Array] = None) -> jax.Array:
        """Predict the velocity/noise for latent [B, H, W, C] at
        timesteps t [B] with optional conditioning [B, cond_dim]."""
        c = self.cfg
        dt = c.dtype
        h = (self.patchify(x_latent).astype(dt)
             @ params["patch_in"].astype(dt))
        h = h + params["pos"].astype(dt)[None]
        temb = timestep_embedding(t, 256)
        temb = jax.nn.silu(temb @ params["t_mlp1"]) @ params["t_mlp2"]
        if cond is not None:
            temb = temb + cond.astype(jnp.float32) @ params["cond_in"]
        temb = temb.astype(jnp.float32)            # [B, d]
        nh = c.heads
        hd = c.hidden // nh

        def norm(x):
            x32 = x.astype(jnp.float32)
            m = jnp.mean(x32, -1, keepdims=True)
            v = jnp.var(x32, -1, keepdims=True)
            return ((x32 - m) * jax.lax.rsqrt(v + 1e-6)).astype(dt)

        def block(h, lp):
            B, T, d = h.shape
            mod = jax.nn.silu(temb) @ lp["mod"].astype(jnp.float32)
            (s1, g1, a1, s2, g2, a2) = jnp.split(mod, 6, axis=-1)
            hn = norm(h) * (1 + g1[:, None].astype(dt)) \
                + s1[:, None].astype(dt)
            qkv = hn @ lp["qkv"].astype(dt)
            q, k, v = jnp.split(qkv.reshape(B, T, 3, nh, hd), 3, axis=2)
            q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
            sc = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            pr = jax.nn.softmax(sc.astype(jnp.float32), -1).astype(dt)
            at = jnp.einsum("bhqk,bkhd->bqhd", pr, v).reshape(B, T, d)
            h = h + a1[:, None].astype(dt) * (at @ lp["proj"].astype(dt))
            hn = norm(h) * (1 + g2[:, None].astype(dt)) \
                + s2[:, None].astype(dt)
            ff = jax.nn.gelu((hn @ lp["fc1"].astype(dt))
                             .astype(jnp.float32)).astype(dt)
            h = h + a2[:, None].astype(dt) * (ff @ lp["fc2"].astype(dt))
            return h, None

        h, _ = jax.lax.scan(block, h, params["layers"])
        fmod = jax.nn.silu(temb) @ params["final_mod"].astype(jnp.float32)
        s, g = jnp.split(fmod, 2, axis=-1)
        h = norm(h) * (1 + g[:, None].astype(dt)) + s[:, None].astype(dt)
        out = h @ params["patch_out"].astype(dt)
        return self.unpatchify(out.astype(jnp.float32))
