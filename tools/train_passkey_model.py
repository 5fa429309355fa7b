#!/usr/bin/env python
"""Train the committed tiny PASSKEY-retrieval checkpoint.

Round-4 verdict #8 needs long-context retrieval evidence at toy scale,
but the tinycode-llama checkpoint has no induction for the passkey
pattern. This trains a 2-layer byte-level llama ON the synthetic
passkey task itself (random keys — the model must learn to COPY the
earlier key, i.e. form induction heads; unseen keys at eval prove it
retrieves rather than memorizes). Random position offsets during
training make the heads position-relative, so the model generalizes to
contexts far beyond the training window (evaluate/tasks.py passkey
sweeps depth and length).

Run: python tools/train_passkey_model.py  (~15 min CPU)
"""
import json
import math
import sys
import time
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
OUT = REPO / "tests" / "assets" / "tinypasskey-llama"
SEQ = 256
BATCH = 32
STEPS = 5000
TIME_BUDGET_S = 1900
LR = 1e-3
MAX_POS = 4096

FILLER_LINES = [
    b"def update(self, x):\n    return x + 1\n",
    b"for i in range(8):\n    total += vals[i]\n",
    b"if cond:\n    out = fn(a, b)\n",
    b"while ok:\n    step(world)\n",
]


def make_doc(rng, d_max: int = None, seq: int = None):
    """Returns (byte ids [SEQ], loss positions of the SECOND key).
    Loss is masked to the retrieval target: the filler is predictable
    noise that would otherwise dominate the objective (first attempt:
    loss 0.08 but 2/16 retrieval)."""
    seq = seq or SEQ
    key = bytes(rng.choice(list(b"0123456789"), 5).astype(np.uint8))
    filler = b""
    while len(filler) < seq:
        filler += FILLER_LINES[int(rng.integers(len(FILLER_LINES)))]
    # marker format: a unique trigger byte that never occurs in the
    # filler — the canonical induction pattern (attend to the earlier
    # MARKER, copy what followed). Text-prefix needles ("PASSKEY = '")
    # need long prefix-matching circuits that tiny models do not form
    # within the CPU budget (probed: loss plateaus ~1.9).
    needle = b"\x01" + key + b"\x02"
    tail = b"\x01" + key + b"\x02"
    room = seq - len(needle) - len(tail)
    pos = int(room * rng.uniform(0.05, 0.95))
    doc = filler[:pos] + needle + filler[pos:room] + tail
    doc = doc[:seq]
    kstart = len(doc) - len(tail) + 1     # first key byte after \x01
    ids = np.frombuffer(doc, np.uint8).astype(np.int64)
    return ids, kstart


def main():
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=257, hidden_size=192,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=MAX_POS,
                      bos_token_id=256, eos_token_id=256,
                      tie_word_embeddings=True)
    model = LlamaForCausalLM(cfg)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"params: {n_params/1e6:.2f}M")
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=0.01)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, total_steps=STEPS + 8, pct_start=0.05)
    rng = np.random.default_rng(0)
    model.train()
    t0 = time.time()
    for step in range(STEPS):
        d_max = 20 + int(step * (2 * SEQ / STEPS))
        docs = [make_doc(rng, d_max) for _ in range(BATCH)]
        x = torch.from_numpy(np.stack([d[0] for d in docs]))
        # dense LM loss grows the copy circuits; the retrieval target
        # is upweighted 20x (masked-only loss plateaus — probed)
        # keep the KEY at ~70% of the total loss mass regardless of
        # SEQ (a flat 0.05 made the 634 filler positions dominate and
        # induction never formed — probed at SEQ 64 vs 640)
        w = torch.full(x.shape, 2.5 / SEQ)
        for bi, (ids, ks) in enumerate(docs):
            w[bi, ks:ks + 6] = 1.0
        # random position offsets: induction must be position-relative
        # to survive contexts beyond the training window
        # position offsets only in the final phase: they slow the
        # initial induction formation (probed) but are needed for
        # beyond-training-length generalization
        hi = MAX_POS - SEQ if step > 0.7 * STEPS else 1
        p0 = torch.from_numpy(rng.integers(0, max(1, hi),
                                           size=(BATCH, 1)))
        pos_ids = p0 + torch.arange(SEQ)[None]
        import torch.nn.functional as F
        lg = model(input_ids=x, position_ids=pos_ids).logits
        ce = F.cross_entropy(lg[:, :-1].reshape(-1, 257),
                             x[:, 1:].reshape(-1), reduction="none")
        loss = (ce * w[:, 1:].reshape(-1)).sum() / w[:, 1:].sum()

        class _O:
            pass
        out = _O()
        out.loss = loss
        key_mask = (w[:, 1:].reshape(-1) == 1.0)
        out.key_loss = (ce * key_mask).sum() / key_mask.sum()
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        try:
            sched.step()
        except ValueError:
            pass   # schedule exhausted: hold the final LR
        opt.zero_grad(set_to_none=True)
        if step % 100 == 0 or step == STEPS - 1:
            print(f"step {step:5d} loss {out.loss.item():.3f} "
                  f"key {out.key_loss.item():.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if time.time() - t0 > TIME_BUDGET_S:
            print(f"time budget hit at step {step}", flush=True)
            break

    # held-out check: UNSEEN keys must be retrieved (greedy)
    model.eval()
    hits = 0
    vr = np.random.default_rng(999)
    for _ in range(16):
        doc, kstart = make_doc(vr)
        s = bytes(doc.astype(np.uint8))
        cut = kstart
        ids = list(doc[:cut])
        key = s[cut:cut + 5]
        with torch.no_grad():
            for _ in range(5):
                lg = model(torch.tensor([ids])).logits[0, -1]
                ids.append(int(torch.argmax(lg)))
        hits += bytes(ids[cut:]) == key
    print(f"held-out retrieval {hits}/16")

    model.to(torch.bfloat16)
    OUT.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(OUT, safe_serialization=True)
    (OUT / "meta.json").write_text(json.dumps({
        "task": "synthetic passkey retrieval (unseen keys)",
        "retrieval_16": hits, "params": n_params,
        "train_positions": f"random offsets in [0, {MAX_POS - SEQ})",
        "eval_ctx": SEQ - 6,
    }, indent=1))
    print(f"saved to {OUT}")


if __name__ == "__main__":
    main()
