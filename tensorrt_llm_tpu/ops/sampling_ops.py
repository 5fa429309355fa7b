"""Batched in-graph sampling ops.

Device-side analog of the reference sampling kernels (reference:
cpp/tensorrt_llm/kernels/samplingTopKKernels.cu, samplingTopPKernels.cu,
penaltyKernels.cu; torch-side strategy grouping
tensorrt_llm/_torch/pyexecutor/sampling_utils.py:39-47). Instead of
per-strategy kernel dispatch, one vectorized routine handles the whole
batch with per-row parameters — masking work is a single [B, V] sort and
the multinomial draw is a Gumbel argmax, both MXU/VPU friendly with static
shapes. Greedy rows bypass the noise.

All functions are jit-safe and run inside the decode step graph.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(jnp.finfo(jnp.float32).min)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SamplingTensors:
    """Per-row sampling controls, padded to the batch bucket.

    top_k == 0 disables top-k; top_p == 1 disables top-p; greedy rows use
    pure argmax (temperature==0 semantics of SamplingParams).
    """
    temperature: jax.Array        # f32[B]
    top_k: jax.Array              # i32[B]
    top_p: jax.Array              # f32[B]
    min_p: jax.Array              # f32[B]
    greedy: jax.Array             # bool[B]
    repetition_penalty: jax.Array  # f32[B]
    presence_penalty: jax.Array   # f32[B]
    frequency_penalty: jax.Array  # f32[B]

    @staticmethod
    def from_requests(requests, batch_size: int) -> "SamplingTensors":
        """Host-side packing of SamplingParams into padded arrays."""
        import numpy as np
        n = len(requests)
        temp = np.ones(batch_size, np.float32)
        top_k = np.zeros(batch_size, np.int32)
        top_p = np.ones(batch_size, np.float32)
        min_p = np.zeros(batch_size, np.float32)
        greedy = np.ones(batch_size, bool)
        rep = np.ones(batch_size, np.float32)
        pres = np.zeros(batch_size, np.float32)
        freq = np.zeros(batch_size, np.float32)
        for i, r in enumerate(requests[:batch_size]):
            sp = r.sampling_params
            greedy[i] = sp.greedy
            temp[i] = max(sp.temperature, 1e-5)
            top_k[i] = sp.top_k
            top_p[i] = sp.top_p
            min_p[i] = sp.min_p
            rep[i] = sp.repetition_penalty
            pres[i] = sp.presence_penalty
            freq[i] = sp.frequency_penalty
        return SamplingTensors(
            temperature=jnp.asarray(temp), top_k=jnp.asarray(top_k),
            top_p=jnp.asarray(top_p), min_p=jnp.asarray(min_p),
            greedy=jnp.asarray(greedy),
            repetition_penalty=jnp.asarray(rep),
            presence_penalty=jnp.asarray(pres),
            frequency_penalty=jnp.asarray(freq))


def apply_penalties(logits: jax.Array,          # f32[B, V]
                    token_counts: jax.Array,    # i32[B, V] output-token counts
                    st: SamplingTensors) -> jax.Array:
    """Repetition/presence/frequency penalties (penaltyKernels.cu
    semantics: rep divides positive logits / multiplies negative ones for
    seen tokens; presence subtracts a flat value; frequency subtracts
    count-proportional)."""
    seen = token_counts > 0
    rep = st.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen, penalized, logits)
    logits = logits - jnp.where(seen, st.presence_penalty[:, None], 0.0)
    logits = logits - token_counts.astype(jnp.float32) * \
        st.frequency_penalty[:, None]
    return logits


def mask_logits(logits: jax.Array, st: SamplingTensors) -> jax.Array:
    """Temperature + top-k + top-p + min-p masking. Returns processed
    logits (masked entries = -inf), ready for Gumbel argmax / softmax."""
    B, V = logits.shape
    scaled = logits.astype(jnp.float32) / st.temperature[:, None]
    sorted_desc = -jnp.sort(-scaled, axis=-1)

    # top-k: value threshold at the k-th largest
    k = jnp.where(st.top_k > 0, st.top_k, V)
    kth = jnp.take_along_axis(sorted_desc,
                              jnp.clip(k - 1, 0, V - 1)[:, None], axis=-1)
    mask = scaled >= kth

    # top-p: keep the smallest prefix of the sorted distribution whose
    # cumulative probability reaches top_p (first token always kept)
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < st.top_p[:, None]
    count = jnp.maximum(jnp.sum(keep_sorted, axis=-1), 1)
    p_threshold = jnp.take_along_axis(sorted_desc, (count - 1)[:, None],
                                      axis=-1)
    mask &= scaled >= p_threshold

    # min-p: prob >= min_p * max_prob  ⇔  logit >= max_logit + log(min_p)
    max_logit = jnp.max(scaled, axis=-1, keepdims=True)
    minp_thresh = max_logit + jnp.log(jnp.maximum(st.min_p, 1e-10))[:, None]
    mask &= jnp.where(st.min_p[:, None] > 0, scaled >= minp_thresh, True)

    return jnp.where(mask, scaled, NEG_INF)


def sample(logits: jax.Array,                   # f32/bf16 [B, V]
           st: SamplingTensors,
           key: jax.Array,
           token_counts: Optional[jax.Array] = None,
           row_seeds: Optional[jax.Array] = None
           ) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens i32[B], logprobs f32[B]) — logprob is under the
    processed distribution (LogprobsMode.PROCESSED). ``row_seeds``
    (i32[B], 0 = unseeded) makes a row's noise stream reproducible per
    request (SamplingParams.seed)."""
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_penalties(logits, token_counts, st)
    processed = mask_logits(logits, st)
    if row_seeds is not None:
        # seeded rows: key = f(seed, request-local position) — the token
        # stream reproduces regardless of batch composition; unseeded
        # rows use the engine's per-iteration key
        seed_const = jax.random.PRNGKey(0x5EED)
        B = processed.shape[0]

        def rk(seed, pos, i):
            k_seeded = jax.random.fold_in(
                jax.random.fold_in(seed_const, seed), pos)
            k_plain = jax.random.fold_in(key, i)
            return jnp.where(seed != 0, k_seeded, k_plain)
        seeds, pos = row_seeds
        row_keys = jax.vmap(rk)(seeds, pos,
                                jnp.arange(B, dtype=jnp.int32))
        gumbel = jax.vmap(
            lambda k: jax.random.gumbel(k, (processed.shape[-1],),
                                        dtype=jnp.float32))(row_keys)
    else:
        gumbel = jax.random.gumbel(key, processed.shape, dtype=jnp.float32)
    noisy = processed + gumbel
    sampled = jnp.argmax(noisy, axis=-1)
    greedy_tok = jnp.argmax(logits, axis=-1)
    tokens = jnp.where(st.greedy, greedy_tok, sampled).astype(jnp.int32)
    logz = jax.nn.logsumexp(processed, axis=-1)
    chosen = jnp.take_along_axis(processed, tokens[:, None], axis=-1)[:, 0]
    logprobs = chosen - logz
    return tokens, logprobs


def _row_keys(key, row_seeds, B):
    """Per-row PRNG keys: position-folded for seeded rows, iteration
    key otherwise (same scheme as :func:`sample`)."""
    seed_const = jax.random.PRNGKey(0x5EED)

    def rk(seed, pos, i):
        k_seeded = jax.random.fold_in(
            jax.random.fold_in(seed_const, seed), pos)
        k_plain = jax.random.fold_in(key, i)
        return jnp.where(seed != 0, k_seeded, k_plain)
    seeds, pos = row_seeds
    return jax.vmap(rk)(seeds, pos, jnp.arange(B, dtype=jnp.int32))


def rejection_sample(logits: jax.Array,          # f32 [R, V] (R = S*G)
                     st: SamplingTensors,        # repeated per row
                     key: jax.Array,
                     draft_ids: jax.Array,       # i32[R], -1 = no draft
                     token_counts: Optional[jax.Array] = None,
                     row_seeds: Optional[Tuple] = None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Lossless speculative acceptance for sampled rows
    (reference: speculativeDecoding rejection-sampling kernels;
    Leviathan et al. with a deterministic drafter, q = point mass).

    Per draft position: accept d with prob p(d); on rejection resample
    from p with d's mass removed (renormalized) — the emitted token then
    differs from the draft, so the host's accept-longest-prefix logic
    needs no change. Rows without a draft (-1: bonus position, padding)
    sample from p directly. Greedy rows emit argmax — acceptance is the
    host-side equality test, exactly as without speculation."""
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_penalties(logits, token_counts, st)
    processed = mask_logits(logits, st)
    R, V = processed.shape
    probs = jax.nn.softmax(processed, axis=-1)
    d = jnp.clip(draft_ids, 0)
    has_draft = draft_ids >= 0
    p_d = jnp.take_along_axis(probs, d[:, None], axis=-1)[:, 0]

    if row_seeds is not None:
        row_keys = _row_keys(key, row_seeds, R)
    else:
        row_keys = jax.vmap(
            lambda i: jax.random.fold_in(key, i))(
                jnp.arange(R, dtype=jnp.int32))
    u = jax.vmap(lambda k: jax.random.uniform(k, (), jnp.float32))(
        jax.vmap(lambda k: jax.random.fold_in(k, 7))(row_keys))
    accept = has_draft & (u < p_d)

    # residual distribution: p with the rejected draft's mass removed
    onehot = jax.nn.one_hot(d, V, dtype=jnp.float32)
    resid = jnp.where(has_draft[:, None], probs * (1.0 - onehot), probs)
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(rs > 1e-9, resid / jnp.maximum(rs, 1e-9), probs)
    g = jax.vmap(lambda k: jax.random.gumbel(k, (V,), jnp.float32))(
        jax.vmap(lambda k: jax.random.fold_in(k, 11))(row_keys))
    resampled = jnp.argmax(jnp.log(jnp.maximum(resid, 1e-30)) + g,
                           axis=-1).astype(jnp.int32)

    # seeded rows use sample-and-match instead: draw the position-keyed
    # sample the baseline WOULD draw and accept iff it equals the draft
    # — emitted stream is bit-identical to non-speculative decoding
    # (the reference's draft-token "matching" acceptance); unseeded rows
    # get true rejection sampling (higher acceptance, lossless in
    # distribution)
    gm = jax.vmap(lambda k: jax.random.gumbel(k, (V,), jnp.float32))(
        row_keys)
    match_tok = jnp.argmax(processed + gm, axis=-1).astype(jnp.int32)
    if row_seeds is not None:
        is_seeded = row_seeds[0] != 0
    else:
        is_seeded = jnp.zeros((R,), bool)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    rej_tok = jnp.where(accept, d, resampled)
    sampled = jnp.where(is_seeded, match_tok, rej_tok)
    tokens = jnp.where(st.greedy, greedy_tok, sampled).astype(jnp.int32)
    logz = jax.nn.logsumexp(processed, axis=-1)
    chosen = jnp.take_along_axis(processed, tokens[:, None], axis=-1)[:, 0]
    return tokens, chosen - logz


def top_logprobs(logits: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k (values, ids) of log-softmax — for SamplingParams.logprobs."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, ids = jax.lax.top_k(lp, k)
    return vals, ids.astype(jnp.int32)


NGRAM_MAX = 8  # largest supported no_repeat_ngram_size (static bound)


def ngram_ban_mask(hist_rows: jax.Array,       # i32[S, L] per-row history
                   ngram_n: jax.Array,         # i32[S] (0 = off)
                   sample_idx: jax.Array,      # i32[S] seq index being sampled
                   row_valid: jax.Array,       # bool[S]
                   vocab_size: int) -> jax.Array:
    """In-graph no-repeat-ngram ban (reference:
    cpp/tensorrt_llm/kernels/banRepeatNgram/banRepeatNgram.cu — ban any
    token v whose appended n-gram already occurs in the sequence).

    ``hist_rows[s, i]`` holds the token at sequence index ``i`` (prompt +
    committed outputs, written by the engine). The token about to be
    sampled lands at index ``sample_idx[s]``; its preceding (n-1)-gram is
    ``hist[sample_idx-n+1 : sample_idx]``. For every earlier start j with
    ``hist[j : j+n-1]`` equal to that gram, token ``hist[j+n-1]`` is
    banned. Returns bool[S, vocab] — True = banned.
    """
    S, L = hist_rows.shape
    NM = NGRAM_MAX
    n = ngram_n
    pos = jnp.arange(L, dtype=jnp.int32)
    # the trailing (n-1)-gram, gathered per row
    i_iota = jnp.arange(NM - 1, dtype=jnp.int32)
    pidx = sample_idx[:, None] - n[:, None] + 1 + i_iota[None, :]
    pvalid = i_iota[None, :] < (n[:, None] - 1)
    pref = jnp.take_along_axis(hist_rows, jnp.clip(pidx, 0, L - 1), axis=1)
    # window match at every start j (shifted static-slice compares)
    hp = jnp.pad(hist_rows, ((0, 0), (0, NM)), constant_values=-1)
    match = jnp.ones((S, L), bool)
    for i in range(NM - 1):
        eq = hp[:, i:i + L] == pref[:, i][:, None]
        match &= eq | ~pvalid[:, i][:, None]
    # j must leave room for the full n-gram strictly before sample_idx
    valid_j = (pos[None, :] <= sample_idx[:, None] - n[:, None]) & \
        (n[:, None] > 0) & row_valid[:, None]
    src = match & valid_j
    bidx = jnp.clip(pos[None, :] + n[:, None] - 1, 0, L - 1)
    btok = jnp.take_along_axis(hist_rows, bidx, axis=1)      # [S, L]
    cols = jnp.where(src, btok, vocab_size)                  # drop non-hits
    ban = jnp.zeros((S, vocab_size), bool)
    return ban.at[jnp.arange(S)[:, None], cols].set(True, mode="drop")
