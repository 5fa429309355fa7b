"""Op-level numerics tests (reference model: tests/unittest/_torch/thop —
op numerics against reference implementations)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.ops import quant as Q
from tensorrt_llm_tpu.ops import sampling_ops as S
from tensorrt_llm_tpu.ops.attention import (AttentionMetadata,
                                            ragged_paged_attention, write_kv)
from tensorrt_llm_tpu.ops.linear import (Fp8QdqMethod, SmoothQuantMethod,
                                         WeightOnlyGroupwiseMethod,
                                         WeightOnlyPerChannelMethod)
from tensorrt_llm_tpu.ops.pallas.quant_matmul import (
    groupwise_dequant_matmul, pack_int4, unpack_int4)
from tensorrt_llm_tpu.llmapi.llm_args import QuantConfig
from tensorrt_llm_tpu.quantization.mode import QuantAlgo


# --------------------------------------------------------------------- #
# Quantization
# --------------------------------------------------------------------- #
def rel_err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)


def test_per_channel_int8_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    q, s = Q.quantize_weight_per_channel(w, bits=8)
    wd = Q.dequantize_weight(q, s, dtype=jnp.float32)
    assert rel_err(wd, w) < 0.01


def test_groupwise_int4_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    q, s, z = Q.quantize_weight_groupwise(w, group_size=64, bits=4)
    assert z is None
    wd = Q.dequantize_weight(q, s, group_size=64, dtype=jnp.float32)
    assert rel_err(wd, w) < 0.15


def test_groupwise_gptq_asymmetric(rng):
    w = jnp.asarray(rng.normal(size=(256, 128)) + 0.5, jnp.float32)
    q, s, z = Q.quantize_weight_groupwise(w, group_size=64, bits=4,
                                          asymmetric=True)
    assert z is not None
    wd = Q.dequantize_weight(q, s, zeros=z, group_size=64, dtype=jnp.float32)
    assert rel_err(wd, w) < 0.1


def test_int4_pack_unpack(rng):
    q = jnp.asarray(rng.integers(-8, 8, size=(64, 128)), jnp.int8)
    packed = pack_int4(q)
    assert packed.shape == (32, 128)
    out = unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(q))


def test_pallas_groupwise_matmul_matches_xla(rng):
    M, K, N, G = 8, 512, 384, 128
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    q, s, _ = Q.quantize_weight_groupwise(w, group_size=G, bits=4)
    expect = x @ Q.dequantize_weight(q, s, group_size=G, dtype=jnp.float32)
    got = groupwise_dequant_matmul(x, pack_int4(q), s, group_size=G,
                                   bits=4, interpret=True)
    assert rel_err(got, expect) < 0.02


def test_pallas_w8_matmul_matches_xla(rng):
    M, K, N, G = 8, 512, 256, 128
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    q, s, _ = Q.quantize_weight_groupwise(w, group_size=G, bits=8)
    expect = x @ Q.dequantize_weight(q, s, group_size=G, dtype=jnp.float32)
    got = groupwise_dequant_matmul(x, q, s, group_size=G, bits=8,
                                   interpret=True)
    assert rel_err(got, expect) < 0.02


@pytest.mark.parametrize("method_cls,kwargs,tol", [
    (WeightOnlyPerChannelMethod, dict(bits=8), 0.02),
    (WeightOnlyPerChannelMethod, dict(bits=4), 0.2),
    (SmoothQuantMethod, dict(), 0.03),
    (Fp8QdqMethod, dict(), 0.06),
])
def test_linear_methods_vs_fp32(rng, method_cls, kwargs, tol):
    qc = QuantConfig(group_size=64)
    if method_cls is WeightOnlyPerChannelMethod:
        m = method_cls(qc, **kwargs)
    else:
        m = method_cls(qc, **kwargs)
    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    params = m.quantize_weights(w)
    out = m.apply(params, x)
    expect = x @ w
    assert rel_err(out, expect) < tol


def test_groupwise_method_xla_path(rng):
    qc = QuantConfig(quant_algo=QuantAlgo.W4A16_AWQ, group_size=64)
    m = WeightOnlyGroupwiseMethod(qc, bits=4, use_pallas=False)
    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    out = m.apply(m.quantize_weights(w), x)
    assert rel_err(out, x @ w) < 0.12


# --------------------------------------------------------------------- #
# Sampling
# --------------------------------------------------------------------- #
def _st(**kw):
    B = kw.pop("B", 4)
    base = dict(
        temperature=jnp.ones(B), top_k=jnp.zeros(B, jnp.int32),
        top_p=jnp.ones(B), min_p=jnp.zeros(B),
        greedy=jnp.zeros(B, bool),
        repetition_penalty=jnp.ones(B),
        presence_penalty=jnp.zeros(B), frequency_penalty=jnp.zeros(B))
    base.update(kw)
    return S.SamplingTensors(**base)


def test_greedy_sampling(rng):
    logits = jnp.asarray(rng.normal(size=(4, 50)), jnp.float32)
    st = _st(greedy=jnp.ones(4, bool))
    toks, lps = S.sample(logits, st, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(logits), -1))
    assert np.all(np.asarray(lps) <= 0)


def test_top_k_restricts_support(rng):
    logits = jnp.asarray(rng.normal(size=(4, 50)), jnp.float32)
    st = _st(top_k=jnp.full(4, 3, jnp.int32))
    top3 = np.argsort(-np.asarray(logits), -1)[:, :3]
    for seed in range(20):
        toks, _ = S.sample(logits, st, jax.random.PRNGKey(seed))
        for b in range(4):
            assert int(toks[b]) in top3[b]


def test_top_p_restricts_support():
    # one dominant token (p>0.9) → top_p=0.5 must always pick it
    logits = jnp.full((2, 10), -10.0).at[:, 3].set(10.0)
    st = _st(B=2, top_p=jnp.full(2, 0.5))
    for seed in range(10):
        toks, _ = S.sample(logits, st, jax.random.PRNGKey(seed))
        assert np.all(np.asarray(toks) == 3)


def test_temperature_flattens(rng):
    logits = jnp.asarray(rng.normal(size=(1, 8)) * 3, jnp.float32)
    hot = _st(B=1, temperature=jnp.asarray([100.0]))
    picks = set()
    for seed in range(40):
        toks, _ = S.sample(logits, hot, jax.random.PRNGKey(seed))
        picks.add(int(toks[0]))
    assert len(picks) > 3  # near-uniform


def test_penalties():
    logits = jnp.zeros((1, 6))
    counts = jnp.zeros((1, 6), jnp.int32).at[0, 2].set(3)
    st = _st(B=1, repetition_penalty=jnp.asarray([2.0]),
             presence_penalty=jnp.asarray([0.5]),
             frequency_penalty=jnp.asarray([0.1]))
    out = S.apply_penalties(logits, counts, st)
    out = np.asarray(out)
    assert out[0, 2] < out[0, 0]
    assert out[0, 2] == pytest.approx(-0.5 - 0.3)  # presence + 3*freq


# --------------------------------------------------------------------- #
# Paged attention (reference backend) vs dense attention
# --------------------------------------------------------------------- #
def dense_attention(q, k, v, causal_offset, sm_scale):
    # q: [Tq, H, D], k/v: [Tk, Hkv, D]
    Tq, H, D = q.shape
    Tk, Hkv, _ = k.shape
    g = H // Hkv
    k = np.repeat(k, g, axis=1)
    v = np.repeat(v, g, axis=1)
    scores = np.einsum("qhd,khd->hqk", q, k) * sm_scale
    qpos = causal_offset + np.arange(Tq)[None, :, None]
    kpos = np.arange(Tk)[None, None, :]
    scores = np.where(kpos <= qpos, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hqk,khd->qhd", p, v)


def test_paged_attention_mixed_batch(rng):
    ps, P, H, Hkv, D = 4, 8, 4, 2, 16
    num_pages = 32
    kv_pages = jnp.zeros((num_pages, ps, 2 * Hkv, D), jnp.float32)

    # seq0: prefill 6 tokens; seq1: decode 1 token with 9 past
    ctx_len0, past1 = 6, 9
    S_ = 2
    pages0 = [1, 2]
    pages1 = [5, 6, 7]
    k1_past = rng.normal(size=(past1, Hkv, D)).astype(np.float32)
    v1_past = rng.normal(size=(past1, Hkv, D)).astype(np.float32)
    # write seq1's past KV
    flat = np.zeros((num_pages * ps, 2 * Hkv, D), np.float32)
    for t in range(past1):
        slot = pages1[t // ps] * ps + t % ps
        flat[slot, 0::2] = k1_past[t]
        flat[slot, 1::2] = v1_past[t]
    kv_pages = jnp.asarray(flat.reshape(num_pages, ps, 2 * Hkv, D))

    q0 = rng.normal(size=(ctx_len0, H, D)).astype(np.float32)
    k0 = rng.normal(size=(ctx_len0, Hkv, D)).astype(np.float32)
    v0 = rng.normal(size=(ctx_len0, Hkv, D)).astype(np.float32)
    q1 = rng.normal(size=(1, H, D)).astype(np.float32)
    k1 = rng.normal(size=(1, Hkv, D)).astype(np.float32)
    v1 = rng.normal(size=(1, Hkv, D)).astype(np.float32)

    T = ctx_len0 + 1
    q = jnp.asarray(np.concatenate([q0, q1]))
    k_new = jnp.asarray(np.concatenate([k0, k1]))
    v_new = jnp.asarray(np.concatenate([v0, v1]))
    slot_map = [pages0[t // ps] * ps + t % ps for t in range(ctx_len0)]
    slot_map.append(pages1[past1 // ps] * ps + past1 % ps)

    page_indices = np.zeros((S_, P), np.int32)
    page_indices[0, :2] = pages0
    page_indices[1, :3] = pages1
    md = AttentionMetadata(
        kv_lens=jnp.asarray([ctx_len0, past1 + 1], jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray([0, ctx_len0, T], jnp.int32),
        num_seqs=jnp.asarray([2], jnp.int32),
        slot_mapping=jnp.asarray(slot_map, jnp.int32),
        positions=jnp.asarray(list(range(ctx_len0)) + [past1], jnp.int32),
        logits_indices=jnp.asarray([ctx_len0 - 1, T - 1], jnp.int32))

    sm = 1.0 / np.sqrt(D)
    kv_pages = write_kv(kv_pages, k_new, v_new, md.slot_mapping)
    out = ragged_paged_attention(q, kv_pages, md, sm_scale=sm,
                                 backend="reference")
    out = np.asarray(out)

    exp0 = dense_attention(q0, k0, v0, 0, sm)
    exp1 = dense_attention(q1, np.concatenate([k1_past, k1]),
                           np.concatenate([v1_past, v1]), past1, sm)
    np.testing.assert_allclose(out[:ctx_len0], exp0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out[ctx_len0:], exp1, rtol=2e-4, atol=2e-4)


def test_write_kv_quantized(rng):
    ps, Hkv, D = 4, 2, 8
    kv_pages = jnp.zeros((4, ps, 2 * Hkv, D), jnp.int8)
    k = jnp.asarray(rng.normal(size=(3, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(3, Hkv, D)), jnp.float32)
    slots = jnp.asarray([0, 1, 2], jnp.int32)
    scale = 0.05
    pages = write_kv(kv_pages, k, v, slots, k_scale=scale, v_scale=scale)
    flat = np.asarray(pages).reshape(-1, 2 * Hkv, D)
    recon_k = flat[0, 0::2].astype(np.float32) * scale
    np.testing.assert_allclose(recon_k, np.asarray(k[0]), atol=scale)


def test_sliding_window_attention(rng):
    """Sliding window must mask tokens beyond the window."""
    ps, H, D = 4, 2, 8
    num_pages, P = 8, 4
    T = 10
    window = 4
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    slots = jnp.arange(T, dtype=jnp.int32)
    kv_pages = jnp.zeros((num_pages, ps, 2 * H, D), jnp.float32)
    kv_pages = write_kv(kv_pages, k, v, slots)
    md = AttentionMetadata(
        kv_lens=jnp.asarray([T], jnp.int32),
        page_indices=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        slot_mapping=slots,
        positions=jnp.arange(T, dtype=jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32))
    sm = 1.0 / np.sqrt(D)
    out = ragged_paged_attention(q, kv_pages, md, sm_scale=sm,
                                 sliding_window=window, backend="reference")
    # manual windowed attention for the last token
    qn, kn, vn = map(np.asarray, (q, k, v))
    lo = T - window
    scores = np.einsum("hd,khd->hk", qn[-1], kn[lo:]) * sm
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    expect = np.einsum("hk,khd->hd", p, vn[lo:])
    np.testing.assert_allclose(np.asarray(out)[-1], expect, rtol=1e-4,
                               atol=1e-4)


def test_decode_attention_kernel_interpret(rng):
    """In-repo paged decode kernel vs dense reference (interpret mode)."""
    import jax.numpy as jnp
    from tensorrt_llm_tpu.ops.pallas.decode_attention import \
        paged_decode_attention
    S, qh, kvh, hd, ps, P = 3, 8, 2, 64, 16, 10
    q = jnp.asarray(rng.normal(size=(S, qh, hd)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(P, ps, 2 * kvh, hd)), jnp.float32)
    kv_lens = jnp.asarray([37, 5, 0], jnp.int32)
    pi = jnp.asarray([[1, 2, 3, 0], [5, 0, 0, 0], [0, 0, 0, 0]], jnp.int32)
    out = paged_decode_attention(q, kv, kv_lens, pi, sm_scale=0.125,
                                 interpret=True)
    group = qh // kvh
    for s in range(2):
        L = int(kv_lens[s])
        pages = np.asarray(pi[s])
        kfull = np.concatenate([np.asarray(kv[p]) for p in pages])[:L]
        ks, vs = kfull[:, 0::2, :], kfull[:, 1::2, :]
        for h in range(kvh):
            for g in range(group):
                sc = (np.asarray(q[s, h * group + g]) @ ks[:, h, :].T) * 0.125
                p_ = np.exp(sc - sc.max())
                p_ /= p_.sum()
                expect = p_ @ vs[:, h, :]
                np.testing.assert_allclose(
                    np.asarray(out[s, h * group + g]), expect, atol=1e-4)
