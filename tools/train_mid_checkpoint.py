#!/usr/bin/env python
"""Train a ~180M-param byte-level llama ON THE TPU (the bandwidth-bound
speculation target; VERDICT r4 #5).

The 4.4M tinycode-llama proved the acceptance chain but its decode is
dispatch-bound, so speculation shows no wall-clock win (bench_notes
round 4 regime analysis). This trains "tinycode-llama-mid": hidden
1024, 16 layers, 8x128 q heads / 2 kv heads — at bs8 decode its weight
read (~360MB/step) dominates the step, so amortizing it over ~2
tokens/verify must show up as wall-clock. Same self-contained corpus
(this repo's Python sources), byte-level vocab 257, HF-format
safetensors output that the normal ingestion path loads.

Runs the training loop in JAX on the attached chip (~10 min); the
checkpoint is written to tests/assets/tinycode-llama-mid/.

Env: MID_STEPS (default 1800), MID_OUT, MID_HIDDEN/LAYERS for sweeps.
"""
import json
import math
import os
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = Path(os.environ.get("MID_OUT",
                          REPO / "tests" / "assets" / "tinycode-llama-mid"))
SEQ = 512
BATCH = int(os.environ.get("MID_BATCH", "8"))
STEPS = int(os.environ.get("MID_STEPS", "1800"))
LR = 6e-4
H = int(os.environ.get("MID_HIDDEN", "1024"))
L = int(os.environ.get("MID_LAYERS", "16"))
HEADS, KVH, HD = H // 128, 2, 128
INTER = int(os.environ.get("MID_INTER", "2816"))
V = 257


def corpus() -> np.ndarray:
    parts = []
    for sub in ("tensorrt_llm_tpu", "tools", "tests"):
        for p in sorted((REPO / sub).rglob("*.py")):
            parts.append(p.read_bytes())
    return np.frombuffer(b"\n".join(parts), np.uint8).astype(np.int32)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    data = corpus()
    split = int(len(data) * 0.985)
    train, val = data[:split], data[split:]
    print(f"corpus {len(data)/1e6:.1f}MB; H={H} L={L} heads={HEADS}",
          flush=True)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def init():
        ks = jax.random.split(key, 12)
        s = lambda *sh: 0.02
        p = {
            "embed": jax.random.normal(ks[0], (V, H)) * 0.02,
            "q": jax.random.normal(ks[1], (L, H, HEADS * HD)) * s(),
            "k": jax.random.normal(ks[2], (L, H, KVH * HD)) * s(),
            "v": jax.random.normal(ks[3], (L, H, KVH * HD)) * s(),
            "o": jax.random.normal(ks[4], (L, HEADS * HD, H)) * s(),
            "gate": jax.random.normal(ks[5], (L, H, INTER)) * s(),
            "up": jax.random.normal(ks[6], (L, H, INTER)) * s(),
            "down": jax.random.normal(ks[7], (L, INTER, H)) * s(),
            "ln1": jnp.ones((L, H)),
            "ln2": jnp.ones((L, H)),
            "lnf": jnp.ones((H,)),
            "lm": jax.random.normal(ks[8], (H, V)) * 0.02,
        }
        return jax.tree.map(lambda a: a.astype(jnp.float32), p)

    pos = np.arange(SEQ)
    inv = 1.0 / (10000 ** (np.arange(0, HD, 2) / HD))
    ang = pos[:, None] * inv[None, :]
    COS = jnp.asarray(np.cos(ang), jnp.float32)   # [T, HD/2]
    SIN = jnp.asarray(np.sin(ang), jnp.float32)

    def rope(x):                  # [B, T, nh, HD]
        x1, x2 = x[..., : HD // 2], x[..., HD // 2:]
        c = COS[None, :, None, :]
        sn = SIN[None, :, None, :]
        return jnp.concatenate([x1 * c - x2 * sn, x2 * c + x1 * sn], -1)

    def rms(x, w):
        x32 = x.astype(jnp.float32)
        n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                                + 1e-6)
        return (n * w).astype(x.dtype)

    mask = jnp.tril(jnp.ones((SEQ, SEQ), bool))

    def forward(p, x):            # x i32[B, T]
        h = p["embed"][x].astype(jnp.bfloat16)

        def layer(h, lp):
            B, T, _ = h.shape
            hn = rms(h, lp["ln1"])
            q = (hn @ lp["q"].astype(jnp.bfloat16)).reshape(
                B, T, HEADS, HD)
            k = (hn @ lp["k"].astype(jnp.bfloat16)).reshape(B, T, KVH, HD)
            v = (hn @ lp["v"].astype(jnp.bfloat16)).reshape(B, T, KVH, HD)
            q, k = rope(q), rope(k)
            rep = HEADS // KVH
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            sc = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(HD)
            sc = jnp.where(mask[None, None], sc.astype(jnp.float32),
                           -1e30)
            pr = jax.nn.softmax(sc, -1).astype(jnp.bfloat16)
            at = jnp.einsum("bhqk,bkhd->bqhd", pr, v).reshape(B, T, -1)
            h = h + at @ lp["o"].astype(jnp.bfloat16)
            hn = rms(h, lp["ln2"])
            g = jax.nn.silu((hn @ lp["gate"].astype(jnp.bfloat16))
                            .astype(jnp.float32)).astype(jnp.bfloat16)
            h = h + (g * (hn @ lp["up"].astype(jnp.bfloat16))) \
                @ lp["down"].astype(jnp.bfloat16)
            return h, None

        lps = {k2: p[k2] for k2 in
               ("q", "k", "v", "o", "gate", "up", "down", "ln1", "ln2")}
        # rematerialize per layer: the [B, heads, T, T] score tensors
        # would otherwise all live until the backward pass (OOM at 16
        # layers); recompute-in-backward trades ~30% FLOPs for memory
        h, _ = jax.lax.scan(jax.checkpoint(lambda c, lp: layer(c, lp)),
                            h, lps)
        h = rms(h, p["lnf"])
        return (h @ p["lm"].astype(jnp.bfloat16)).astype(jnp.float32)

    def loss_fn(p, x):
        logits = forward(p, x[:, :-1])
        tgt = x[:, 1:]
        lse = jax.nn.logsumexp(logits, -1)
        ll = jnp.take_along_axis(logits, tgt[..., None], -1)[..., 0]
        return jnp.mean(lse - ll)

    sched = optax.warmup_cosine_decay_schedule(0.0, LR, 100, STEPS)
    opt = optax.adamw(sched, weight_decay=0.01)
    params = init()
    n_par = sum(a.size for a in jax.tree.leaves(params))
    print(f"params {n_par/1e6:.1f}M", flush=True)
    state = opt.init(params)

    @jax.jit
    def step(params, state, x):
        l, g = jax.value_and_grad(loss_fn)(params, x)
        up, state = opt.update(g, state, params)
        params = optax.apply_updates(params, up)
        return params, state, l

    import jax.numpy as jnp  # noqa: F811
    t0 = time.monotonic()
    for i in range(STEPS):
        idx = rng.integers(0, len(train) - SEQ - 2, size=BATCH)
        x = np.stack([train[j:j + SEQ + 1] for j in idx])
        params, state, l = step(params, state, jnp.asarray(x))
        if i % 100 == 0 or i == STEPS - 1:
            print(f"step {i}: loss {float(l):.3f} "
                  f"({time.monotonic()-t0:.0f}s)", flush=True)

    # validation byte loss
    vx = np.stack([val[j:j + SEQ + 1]
                   for j in range(0, len(val) - SEQ - 1, SEQ)][:8])
    vl = float(loss_fn(params, jnp.asarray(vx)))
    print(f"val loss {vl:.3f} (ppl {math.exp(vl):.2f}; random=257)",
          flush=True)

    # save HF-format safetensors (bf16 via f32->np.uint16 trick not
    # needed: save f32; the loader casts)
    np_params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    sd = {"model.embed_tokens.weight": np_params["embed"],
          "model.norm.weight": np_params["lnf"],
          "lm_head.weight": np_params["lm"].T.copy()}
    for i in range(L):
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.q_proj.weight"] = np_params["q"][i].T.copy()
        sd[pre + "self_attn.k_proj.weight"] = np_params["k"][i].T.copy()
        sd[pre + "self_attn.v_proj.weight"] = np_params["v"][i].T.copy()
        sd[pre + "self_attn.o_proj.weight"] = np_params["o"][i].T.copy()
        sd[pre + "mlp.gate_proj.weight"] = np_params["gate"][i].T.copy()
        sd[pre + "mlp.up_proj.weight"] = np_params["up"][i].T.copy()
        sd[pre + "mlp.down_proj.weight"] = np_params["down"][i].T.copy()
        sd[pre + "input_layernorm.weight"] = np_params["ln1"][i]
        sd[pre + "post_attention_layernorm.weight"] = np_params["ln2"][i]
    OUT.mkdir(parents=True, exist_ok=True)
    from safetensors.numpy import save_file
    save_file(sd, str(OUT / "model.safetensors"))
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama", "vocab_size": V,
        "hidden_size": H, "intermediate_size": INTER,
        "num_hidden_layers": L, "num_attention_heads": HEADS,
        "num_key_value_heads": KVH, "head_dim": HD,
        "max_position_embeddings": 2048, "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0, "tie_word_embeddings": False,
        "torch_dtype": "float32",
        "bos_token_id": 256, "eos_token_id": 0,
    }
    (OUT / "config.json").write_text(json.dumps(cfg, indent=1))
    (OUT / "TRAINING.json").write_text(json.dumps({
        "val_loss": round(vl, 4), "steps": STEPS, "seq": SEQ,
        "batch": BATCH, "params_m": round(n_par / 1e6, 1),
        "trained_on": "repo python sources (self-contained)",
        "wall_s": round(time.monotonic() - t0, 1)}, indent=1))
    print("saved to", OUT, flush=True)


if __name__ == "__main__":
    main()
