"""NVFP4 / MXFP4 generic linear + NVFP4 KV cache (VERDICT r4 #6).

Reference semantics: _torch/modules/linear.py:1266 (NVFP4 linear:
e2m1 weights in groups of 16, e4m3 group scales x global fp32 scale),
:2053 (MXFP4: groups of 32, e8m0 scales), quantization/mode.py:66-104
(NVFP4 KV-cache flag). TPU realization: exact-e2m1 values stored as
int8 codes with half-step group scales (ops/quant.quantize_weight_fp4);
KV appends round onto the e2m1 grid inside the fp8 pool.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.ops import quant as Q
from tensorrt_llm_tpu.ops.linear import Fp4GroupwiseMethod, make_linear_method
from tensorrt_llm_tpu.quantization.mode import QuantAlgo, KvCacheQuantAlgo
from tensorrt_llm_tpu.llmapi.llm_args import QuantConfig

E2M1 = np.array([0., .5, 1., 1.5, 2., 3., 4., 6.])
GRID = np.sort(np.concatenate([-E2M1, E2M1]))


def _np_fp4_round(x):
    idx = np.abs(x[..., None] - GRID).argmin(axis=-1)
    return GRID[idx]


def test_fp4_round_matches_grid():
    x = np.linspace(-8, 8, 4001, dtype=np.float32)
    got = np.asarray(Q.fp4_round(jnp.asarray(x)))
    want = _np_fp4_round(x)
    # ties can legally round either way; away from ties must match
    mids = (GRID[:-1] + GRID[1:]) / 2
    off_tie = np.all(np.abs(x[:, None] - mids) > 1e-6, axis=1)
    np.testing.assert_allclose(got[off_tie], want[off_tie])
    assert set(np.unique(got)) <= set(GRID)


@pytest.mark.parametrize("fmt,g", [("e4m3", 16), ("e8m0", 32)])
def test_quantize_weight_fp4_roundtrip(fmt, g):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(128, 64)).astype(np.float32)
    q, half = Q.quantize_weight_fp4(jnp.asarray(w), group_size=g,
                                    scale_fmt=fmt)
    q = np.asarray(q)
    half = np.asarray(half)
    assert q.dtype == np.int8
    # codes*2 are integers on the doubled e2m1 grid
    assert set(np.unique(q)) <= {0, 1, -1, 2, -2, 3, -3, 4, -4,
                                 6, -6, 8, -8, 12, -12}
    deq = np.asarray(Q.dequantize_weight(jnp.asarray(q),
                                         jnp.asarray(half),
                                         group_size=g,
                                         dtype=jnp.float32))
    # error bounded by half the largest grid step x the group scale
    scale = half * 2
    step = np.repeat(scale, g, axis=0)
    assert np.all(np.abs(deq - w) <= 1.0 * step + 1e-6)
    # values already on the grid round-trip exactly
    w2 = deq.copy()
    q2, h2 = Q.quantize_weight_fp4(jnp.asarray(w2), group_size=g,
                                   scale_fmt=fmt)
    deq2 = np.asarray(Q.dequantize_weight(q2, h2, group_size=g,
                                          dtype=jnp.float32))
    np.testing.assert_allclose(deq2, w2, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("flavor", ["nvfp4", "mxfp4"])
def test_fp4_method_apply_matches_dequant(flavor):
    rng = np.random.default_rng(1)
    w = rng.normal(size=(256, 96)).astype(np.float32)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    m = Fp4GroupwiseMethod(None, flavor=flavor)
    params = m.quantize_weights(jnp.asarray(w), dtype=jnp.float32)
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    deq = np.asarray(Q.dequantize_weight(
        params["weight"], params["weight_scale"],
        group_size=m.group_size, dtype=jnp.float32))
    want = x @ deq
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=2e-2)
    # fp4 quantization error itself is bounded
    rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
    assert rel < 0.12, f"{flavor} rel err {rel}"


def test_dispatch_no_longer_raises():
    for algo in (QuantAlgo.NVFP4, QuantAlgo.MXFP4):
        m = make_linear_method(QuantConfig(quant_algo=algo))
        assert isinstance(m, Fp4GroupwiseMethod)


def _tiny_model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def _seq_nll(llm, tokens):
    """Mean NLL of `tokens` under the model via prompt_logprobs."""
    from tensorrt_llm_tpu import SamplingParams
    out = llm.generate_async(tokens, SamplingParams(
        max_tokens=1, top_k=1, prompt_logprobs=1,
        ignore_eos=True)).result(timeout=300)
    lps = [list(d.values())[0] if isinstance(d, dict) else d
           for d in out.prompt_logprobs[1:]]
    # prompt_logprobs dicts keyed by actual token: take the actual's lp
    vals = []
    for pos, d in enumerate(out.prompt_logprobs[1:], start=1):
        vals.append(d[tokens[pos]] if isinstance(d, dict) else float(d))
    return -float(np.mean(vals))


def test_nvfp4_model_e2e_ppl_gate():
    """Model-level Δppl gate: NVFP4 vs fp32 on a tiny llama (the
    largest trainable proxy in-image; BASELINE north-star form)."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    hf = _tiny_model()
    kv = KvCacheConfig(tokens_per_block=16, max_tokens=2048)
    rng = np.random.default_rng(3)
    toks = rng.integers(1, 127, size=48).tolist()
    llm16 = LLM(model=hf, skip_tokenizer_init=True, dtype="float32",
                max_batch_size=2, max_input_len=64, max_seq_len=128,
                max_num_tokens=128, kv_cache_config=kv)
    nll16 = _seq_nll(llm16, toks)
    llm16.shutdown()
    llm4 = LLM(model=hf, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=2, max_input_len=64, max_seq_len=128,
               max_num_tokens=128, kv_cache_config=kv,
               quant_config=QuantConfig(quant_algo=QuantAlgo.NVFP4))
    nll4 = _seq_nll(llm4, toks)
    llm4.shutdown()
    dppl = abs(np.exp(nll4) - np.exp(nll16))
    # random-init tiny model: gate on relative ppl regression
    assert dppl / np.exp(nll16) < 0.15, \
        f"NVFP4 ppl {np.exp(nll4):.3f} vs fp32 {np.exp(nll16):.3f}"


def test_nvfp4_kv_write_rounds_to_grid():
    from tensorrt_llm_tpu.ops.attention import write_kv
    pool = jnp.zeros((4, 8, 4, 16), jnp.float8_e4m3fn)
    rng = np.random.default_rng(5)
    k = jnp.asarray(rng.normal(size=(6, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(6, 2, 16)), jnp.float32)
    slots = jnp.arange(6, dtype=jnp.int32)
    scale = 1.0   # normal values stay inside the +-6 grid range
    out = write_kv(pool, k, v, slots, k_scale=scale, v_scale=scale,
                   fp4_grid=True)
    flat = np.asarray(out.astype(jnp.float32)).reshape(32, 4, 16)
    stored = flat[:6, 0::2, :]
    assert set(np.round(np.unique(stored), 4)) <= set(GRID)
    # dequantized (x scale) values approximate the originals within
    # half the widest grid step (2.0 between 4 and 6)
    approx = stored * scale
    err = np.abs(approx - np.clip(np.asarray(k), -6 * scale, 6 * scale))
    assert err.max() <= scale * 1.0 + 1e-6


def test_nvfp4_kv_e2e_generates():
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    hf = _tiny_model()
    llm = LLM(model=hf, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=2, max_input_len=32, max_seq_len=64,
              max_num_tokens=64,
              quant_config=QuantConfig(
                  kv_cache_quant_algo=KvCacheQuantAlgo.NVFP4),
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    assert llm.engine.model.config.kv_fp4_grid
    assert llm.engine.model.attn_spec.kv_fp4
    out = llm.generate_async(
        [1, 5, 9, 13], SamplingParams(max_tokens=8, top_k=1,
                                      ignore_eos=True)).result(timeout=300)
    assert len(out.outputs[0].token_ids) == 8
    llm.shutdown()
