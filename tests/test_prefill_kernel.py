"""Ragged prefill kernel parity vs the dense reference path
(interpret mode on CPU; real-TPU validation rides the bench configs).
Reference role: cpp/kernels/fmha_v2 context FMHA."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.ops.attention import (AttentionMetadata,
                                            _reference_attention)
from tensorrt_llm_tpu.ops.pallas.prefill_attention import (
    ragged_prefill_attention)


def _setup(seed, S, q_lens, ctx_lens, qh, kvh, hd, ps=16, dtype=jnp.float32):
    """Build packed q + paged KV where each seq has ctx_len history and
    q_len new tokens (kv_len = ctx_len + q_len)."""
    rng = np.random.default_rng(seed)
    kv_lens = np.array([c + q for c, q in zip(ctx_lens, q_lens)], np.int32)
    max_pages = int(max((kv_lens.max() + ps - 1) // ps, 1))
    P = S * max_pages + 1
    pages = rng.standard_normal((P, ps, 2 * kvh, hd)).astype(np.float32)
    page_indices = np.arange(S * max_pages, dtype=np.int32) \
        .reshape(S, max_pages)
    T = int(np.sum(q_lens))
    q = rng.standard_normal((T, qh, hd)).astype(np.float32)
    cu = np.zeros(S + 1, np.int32)
    cu[1:] = np.cumsum(q_lens)
    md = AttentionMetadata(
        kv_lens=jnp.asarray(kv_lens),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.full((1,), S, jnp.int32),
        slot_mapping=jnp.zeros((T,), jnp.int32),
        positions=jnp.zeros((T,), jnp.int32),
        logits_indices=jnp.zeros((S,), jnp.int32))
    return (jnp.asarray(q, dtype), jnp.asarray(pages, dtype), md,
            jnp.asarray(cu))


CASES = [
    # (q_lens, ctx_lens, qh, kvh, hd) — TinyLlama-real / gpt2 / mixed
    ([7, 30, 1], [0, 0, 40], 8, 2, 64),          # pure+chunked+decode mix
    ([17, 3], [16, 5], 4, 4, 64),                # MHA, chunked prefill
    ([33], [0], 8, 1, 128),                      # MQA single long prompt
    ([5, 5, 5, 5], [11, 0, 3, 27], 8, 2, 64),    # many small
]


@pytest.mark.parametrize("q_lens,ctx_lens,qh,kvh,hd", CASES)
def test_parity_vs_reference(q_lens, ctx_lens, qh, kvh, hd):
    S = len(q_lens)
    q, pages, md, cu = _setup(0, S, q_lens, ctx_lens, qh, kvh, hd)
    ref = _reference_attention(q, pages, md, sm_scale=hd ** -0.5,
                               sliding_window=None, soft_cap=None,
                               k_scale=None, v_scale=None)
    got = ragged_prefill_attention(
        q, pages, md.kv_lens, md.page_indices, cu,
        sm_scale=hd ** -0.5, max_q_len=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_parity_sliding_window_and_softcap():
    q, pages, md, cu = _setup(1, 2, [25, 9], [10, 30], 8, 2, 64)
    kw = dict(sliding_window=13, soft_cap=30.0)
    ref = _reference_attention(q, pages, md, sm_scale=0.125,
                               k_scale=None, v_scale=None, **kw)
    got = ragged_prefill_attention(
        q, pages, md.kv_lens, md.page_indices, cu, sm_scale=0.125,
        max_q_len=32, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_parity_quantized_kv():
    """int8 KV pool with static dequant scales."""
    rng = np.random.default_rng(3)
    q, pages, md, cu = _setup(2, 2, [9, 17], [5, 0], 4, 2, 64)
    pages_i8 = jnp.asarray(
        np.clip(np.round(np.asarray(pages) / 0.05), -128, 127), jnp.int8)
    kw = dict(k_scale=0.05, v_scale=0.05)
    ref = _reference_attention(q, pages_i8, md, sm_scale=0.125,
                               sliding_window=None, soft_cap=None, **kw)
    got = ragged_prefill_attention(
        q, pages_i8, md.kv_lens, md.page_indices, cu, sm_scale=0.125,
        max_q_len=32, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_padded_trailing_sequences_ignored():
    """Dummy rows (q_len = 0 tail) neither crash nor corrupt output."""
    q, pages, md, cu = _setup(4, 3, [6, 10, 0], [0, 4, 0], 8, 2, 64)
    ref = _reference_attention(q, pages, md, sm_scale=0.125,
                               sliding_window=None, soft_cap=None,
                               k_scale=None, v_scale=None)
    got = ragged_prefill_attention(
        q, pages, md.kv_lens, md.page_indices, cu, sm_scale=0.125,
        max_q_len=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_parity_alibi():
    """ALiBi bias in both kernels matches the dense path (Bloom/MPT)."""
    from tensorrt_llm_tpu.models.modeling_utils import alibi_slopes
    from tensorrt_llm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention)

    q, pages, md, cu = _setup(5, 3, [9, 21, 1], [4, 0, 30], 8, 2, 64)
    sl = alibi_slopes(8)
    ref = _reference_attention(q, pages, md, sm_scale=0.125,
                               sliding_window=None, soft_cap=None,
                               k_scale=None, v_scale=None,
                               alibi_slopes=sl)
    got = ragged_prefill_attention(
        q, pages, md.kv_lens, md.page_indices, cu, sm_scale=0.125,
        alibi_slopes=sl, max_q_len=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # decode kernel: single-token rows
    import dataclasses as _dc
    q2, pages2, md2, cu2 = _setup(6, 4, [1, 1, 1, 1], [7, 30, 2, 19],
                                  8, 2, 64)
    ref2 = _reference_attention(q2, pages2, md2, sm_scale=0.125,
                                sliding_window=None, soft_cap=None,
                                k_scale=None, v_scale=None,
                                alibi_slopes=sl)
    got2 = paged_decode_attention(q2, pages2, md2.kv_lens,
                                  md2.page_indices, sm_scale=0.125,
                                  alibi_slopes=sl, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_sinks():
    """Attention sinks seed the decode kernel's online softmax
    (gpt-oss); parity vs the dense reference (interpret mode)."""
    from tensorrt_llm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention)

    q, pages, md, cu = _setup(9, 4, [1, 1, 1, 1], [7, 30, 2, 19], 8, 2, 64)
    sinks = jnp.asarray(np.linspace(-1.0, 2.0, 8), jnp.float32)
    ref = _reference_attention(q, pages, md, sm_scale=0.125,
                               sliding_window=None, soft_cap=None,
                               k_scale=None, v_scale=None, sinks=sinks)
    got = paged_decode_attention(q, pages, md.kv_lens, md.page_indices,
                                 sm_scale=0.125, sinks=sinks,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # no-sinks path still exact (phantom l0=1 must be annihilated)
    ref2 = _reference_attention(q, pages, md, sm_scale=0.125,
                                sliding_window=None, soft_cap=None,
                                k_scale=None, v_scale=None)
    got2 = paged_decode_attention(q, pages, md.kv_lens, md.page_indices,
                                  sm_scale=0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=2e-5, atol=2e-5)


def test_prefill_kernel_sinks():
    """Sink-seeded online softmax in the ragged prefill kernel."""
    q, pages, md, cu = _setup(11, 3, [9, 21, 1], [4, 0, 30], 8, 2, 64)
    sinks = jnp.asarray(np.linspace(-0.5, 1.5, 8), jnp.float32)
    ref = _reference_attention(q, pages, md, sm_scale=0.125,
                               sliding_window=None, soft_cap=None,
                               k_scale=None, v_scale=None, sinks=sinks)
    got = ragged_prefill_attention(
        q, pages, md.kv_lens, md.page_indices, cu, sm_scale=0.125,
        sinks=sinks, max_q_len=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
