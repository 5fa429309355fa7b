#!/usr/bin/env python
"""Train the committed tiny REAL checkpoint (tests/assets/tinycode-llama).

Round-2 verdict: every accuracy signal in this repo was random-weight
parity; the INT4-AWQ <=0.1 dppl headline had never touched trained
weights. No pretrained checkpoints exist in-image, so this script
TRAINS one: a ~5M-param byte-level Llama on this repository's own
Python sources (self-contained corpus, no external data), then writes a
standard HF checkpoint dir (config.json + model.safetensors, bf16) that
the test suite loads through the real ingestion path
(quantization/lazy_state_dict.py) and gates quantized perplexity
against (tests/test_real_checkpoint.py; reference analog:
tests/integration/defs/accuracy/accuracy_core.py).

Byte-level tokens (vocab 256 + BOS) keep the checkpoint
tokenizer-free: tests feed raw UTF-8 bytes as token ids.

Run: python tools/train_tiny_checkpoint.py  (~10 min on CPU)
"""
import json
import math
import time
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "tests" / "assets" / "tinycode-llama"
BOS = 256
SEQ = 512
BATCH = 16
STEPS = 1200
TIME_BUDGET_S = 2100   # save whatever we have at the budget
LR = 3e-3


def corpus() -> bytes:
    parts = []
    for p in sorted((REPO / "tensorrt_llm_tpu").rglob("*.py")):
        parts.append(p.read_bytes())
    return b"\n".join(parts)


def batches(data: np.ndarray, rng: np.random.Generator, n: int):
    for _ in range(n):
        idx = rng.integers(0, len(data) - SEQ - 1, size=BATCH)
        x = np.stack([data[i:i + SEQ] for i in idx])
        yield torch.from_numpy(x.astype(np.int64))


def main():
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    data = np.frombuffer(corpus(), np.uint8).astype(np.int32)
    split = int(len(data) * 0.98)
    train, val = data[:split], data[split:]
    print(f"corpus: {len(data)/1e6:.1f}M bytes "
          f"({len(train)/1e6:.1f}M train / {len(val)/1e3:.0f}k val)")

    cfg = LlamaConfig(vocab_size=257, hidden_size=256,
                      intermediate_size=688, num_hidden_layers=6,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=1024,
                      bos_token_id=BOS, eos_token_id=BOS,
                      tie_word_embeddings=True)
    model = LlamaForCausalLM(cfg)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"params: {n_params/1e6:.2f}M")
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=0.01)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, total_steps=STEPS, pct_start=0.05)
    rng = np.random.default_rng(0)
    model.train()
    t0 = time.time()

    def save(vloss, step):
        OUT.mkdir(parents=True, exist_ok=True)
        model.save_pretrained(OUT, safe_serialization=True)
        (OUT / "meta.json").write_text(json.dumps({
            "val_loss": round(vloss, 4), "train_steps": step,
            "corpus": "tensorrt_llm_tpu/**/*.py (byte-level)",
            "params": n_params}, indent=1))

    for step, x in enumerate(batches(train, rng, STEPS)):
        out = model(input_ids=x, labels=x)
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        opt.zero_grad(set_to_none=True)
        if step % 50 == 0 or step == STEPS - 1:
            print(f"step {step:5d} loss {out.loss.item():.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if step % 200 == 199:
            save(float(out.loss.item()), step)   # crash insurance
        if time.time() - t0 > TIME_BUDGET_S:
            print(f"time budget hit at step {step}", flush=True)
            break

    model.eval()
    with torch.no_grad():
        vx = torch.from_numpy(
            np.stack([val[i:i + SEQ]
                      for i in range(0, len(val) - SEQ, SEQ)][:16])
            .astype(np.int64))
        vloss = model(input_ids=vx, labels=vx).loss.item()
    print(f"val loss {vloss:.3f} (ppl {math.exp(vloss):.2f}; "
          f"random init would be {math.log(257):.2f})")

    model.to(torch.bfloat16)
    save(vloss, step)
    print(f"saved to {OUT}")


if __name__ == "__main__":
    main()
