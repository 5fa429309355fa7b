"""Teacher-forced scoring / perplexity.

Role of the reference's lm-eval loglikelihood path (reference:
tensorrt_llm/evaluate/lm_eval.py + `gather_context_logits`). Uses the
model directly (no executor): one prefill forward whose
``logits_indices`` cover *every* position, yielding next-token logprobs
for the whole sequence in one step. This is the harness behind the
Δppl-vs-FP16 quantization gate (BASELINE.md: ≤0.1 Δppl for INT4-AWQ).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np


def score_token_logprobs(model, params, token_ids: Sequence[int],
                         page_size: int = 32) -> np.ndarray:
    """log p(token_t | tokens_<t) for t=1..T-1. Returns array [T-1]."""
    import jax.numpy as jnp
    from ..ops.attention import AttentionMetadata

    T = len(token_ids)
    num_pages = -(-T // page_size) + 1
    kv = model.make_kv_pages(num_pages, page_size)
    slots = np.arange(T, dtype=np.int32)
    pages_per_seq = num_pages
    page_indices = np.zeros((1, pages_per_seq), np.int32)
    page_indices[0] = np.arange(pages_per_seq)
    md = AttentionMetadata(
        kv_lens=jnp.asarray([T], jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        slot_mapping=jnp.asarray(slots),
        positions=jnp.asarray(slots),
        # gather logits at every position (prediction targets are t+1)
        logits_indices=jnp.asarray(slots))
    logits, _ = model.forward(params, jnp.asarray(token_ids, jnp.int32),
                              kv, md)
    logits = np.asarray(logits, np.float32)          # [T, V]
    logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)
                         ).sum(-1)) + logits.max(-1)
    targets = np.asarray(token_ids[1:])
    lp = logits[np.arange(T - 1), targets] - logz[:T - 1]
    return lp


def perplexity(model, params, token_ids: Sequence[int],
               page_size: int = 32) -> float:
    lp = score_token_logprobs(model, params, token_ids, page_size)
    return float(math.exp(-lp.mean()))


def prompt_logprob_dicts(model, params, token_ids: Sequence[int],
                         top_k: int = 0,
                         page_size: int = 32) -> List[Optional[dict]]:
    """vLLM-style ``SamplingParams.prompt_logprobs`` payload: one entry
    per prompt position — ``None`` for position 0 (no context), then a
    ``{token_id: logprob}`` dict holding the actual prompt token plus the
    ``top_k`` most likely tokens at that position (reference:
    `gather_context_logits`, tensorrt_llm/sampling_params.py
    prompt_logprobs)."""
    import jax.numpy as jnp
    from ..ops.attention import AttentionMetadata

    T = len(token_ids)
    num_pages = -(-T // page_size) + 1
    kv = model.make_kv_pages(num_pages, page_size)
    slots = np.arange(T, dtype=np.int32)
    page_indices = np.arange(num_pages, dtype=np.int32)[None]
    md = AttentionMetadata(
        kv_lens=jnp.asarray([T], jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        slot_mapping=jnp.asarray(slots),
        positions=jnp.asarray(slots),
        logits_indices=jnp.asarray(slots))
    logits, _ = model.forward(params, jnp.asarray(token_ids, jnp.int32),
                              kv, md)
    logits = np.asarray(logits, np.float32)          # [T, V]
    logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)
                         ).sum(-1)) + logits.max(-1)
    lp = logits - logz[:, None]                      # [T, V] logprobs
    out: List[Optional[dict]] = [None]
    for t in range(1, T):
        row = lp[t - 1]
        entry = {int(token_ids[t]): float(row[token_ids[t]])}
        if top_k > 0:
            for tok in np.argpartition(-row, top_k)[:top_k]:
                entry[int(tok)] = float(row[tok])
        out.append(entry)
    return out
