"""Star attention (reference: attention_backend/star_flashinfer.py —
anchor-block + local-block context encoding, global query phase)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.ops.attention import (AttentionMetadata,
                                            ragged_paged_attention,
                                            write_kv)


def prefill_md(T, pages=8, ps=16):
    return AttentionMetadata(
        kv_lens=jnp.asarray([T], jnp.int32),
        page_indices=jnp.arange(pages, dtype=jnp.int32)[None],
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        slot_mapping=jnp.arange(T, dtype=jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32))


def rand_qkv(T, qh=4, kvh=2, hd=16, seed=0):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.standard_normal((T, qh, hd)), jnp.float32)
    k = jnp.asarray(r.standard_normal((T, kvh, hd)), jnp.float32)
    v = jnp.asarray(r.standard_normal((T, kvh, hd)), jnp.float32)
    return q, k, v


def test_star_exact_within_two_blocks():
    """Contexts spanning <= anchor + one block are exactly dense."""
    T = 24
    q, k, v = rand_qkv(T)
    kv = write_kv(jnp.zeros((8, 16, 4, 16), jnp.float32), k, v,
                  jnp.arange(T, dtype=jnp.int32))
    md = prefill_md(T)
    dense = ragged_paged_attention(q, kv, md, sm_scale=0.25,
                                   backend="reference")
    star = ragged_paged_attention(q, kv, md, sm_scale=0.25,
                                  backend="reference",
                                  star_block_size=16)
    np.testing.assert_allclose(np.asarray(star), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_star_masks_middle_blocks():
    """A 4-block context: block-3 queries see anchor + block 3 only —
    outputs differ from dense, and zeroing blocks 1-2's V leaves star
    outputs for block-3 rows UNCHANGED (they never read them)."""
    T = 64
    bs = 16
    q, k, v = rand_qkv(T, seed=1)
    kv = write_kv(jnp.zeros((8, 16, 4, 16), jnp.float32), k, v,
                  jnp.arange(T, dtype=jnp.int32))
    md = prefill_md(T)
    star = ragged_paged_attention(q, kv, md, sm_scale=0.25,
                                  backend="reference", star_block_size=bs)
    dense = ragged_paged_attention(q, kv, md, sm_scale=0.25,
                                   backend="reference")
    assert not np.allclose(np.asarray(star)[40:], np.asarray(dense)[40:],
                           atol=1e-4)
    v2 = v.at[16:48].set(0.0)
    kv2 = write_kv(jnp.zeros((8, 16, 4, 16), jnp.float32), k, v2,
                   jnp.arange(T, dtype=jnp.int32))
    star2 = ragged_paged_attention(q, kv2, md, sm_scale=0.25,
                                   backend="reference", star_block_size=bs)
    np.testing.assert_allclose(np.asarray(star2)[48:],
                               np.asarray(star)[48:], rtol=1e-5,
                               atol=1e-5)
    # block-1 rows DO read block 1: they change
    assert not np.allclose(np.asarray(star2)[17:32],
                           np.asarray(star)[17:32], atol=1e-4)


def test_star_decode_rows_attend_globally():
    """Query phase: a decode-shaped row sees every block (exact vs
    dense for that row)."""
    T = 64
    q, k, v = rand_qkv(T + 1, seed=2)
    kv = write_kv(jnp.zeros((8, 16, 4, 16), jnp.float32), k[:T], v[:T],
                  jnp.arange(T, dtype=jnp.int32))
    md = AttentionMetadata(
        kv_lens=jnp.asarray([T + 1], jnp.int32),
        page_indices=jnp.arange(8, dtype=jnp.int32)[None],
        cu_q_lens=jnp.asarray([0, 1], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        slot_mapping=jnp.asarray([T], jnp.int32),
        positions=jnp.asarray([T], jnp.int32),
        logits_indices=jnp.asarray([0], jnp.int32))
    kv1 = write_kv(kv, k[T:], v[T:], jnp.asarray([T], jnp.int32))
    dense = ragged_paged_attention(q[T:], kv1, md, sm_scale=0.25,
                                   backend="reference")
    star = ragged_paged_attention(q[T:], kv1, md, sm_scale=0.25,
                                  backend="reference", star_block_size=16)
    np.testing.assert_allclose(np.asarray(star), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_star_e2e_generates():
    """Through the LLM API with STAR config: short contexts (within two
    blocks) generate token-identically to dense."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    from tensorrt_llm_tpu.llmapi.llm_args import SparseAttentionConfig
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256)
    m = LlamaForCausalLM(cfg).eval()
    kw = dict(model=m, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=2, max_input_len=64, max_seq_len=96,
              max_num_tokens=128,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=512))
    sp = SamplingParams(max_tokens=6, top_k=1)
    dense = LLM(**kw)
    ref = dense.generate([5, 9, 23, 44], sp).outputs[0].token_ids
    dense.shutdown()
    star = LLM(sparse_attention_config=SparseAttentionConfig(
        algo="STAR", star_block_size=32), **kw)
    got = star.generate([5, 9, 23, 44], sp).outputs[0].token_ids
    star.shutdown()
    assert got == ref
