"""SmoothQuant with ACTUAL smoothing: calibration, weight folding,
activation divide, and quantization-error reduction on outlier
activations (reference: quantize_by_modelopt int8_sq flow)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def outlier_model():
    """Tiny llama with an injected activation-outlier channel — the
    case SmoothQuant exists for."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256)
    hf = LlamaForCausalLM(cfg).eval()
    with torch.no_grad():
        hf.model.embed_tokens.weight[:, 7] *= 30.0
    return hf


def test_calibration_produces_scales(outlier_model):
    from tensorrt_llm_tpu.quantization.smoothquant import (
        calibrate_smooth_scales, default_calibration_ids)
    scales = calibrate_smooth_scales(
        outlier_model, default_calibration_ids(128), alpha=0.5)
    assert len(scales) >= 14        # every linear in 2 layers + lm_head
    s = scales["model.layers.0.self_attn.q_proj.weight"]
    assert s.shape == (64,) and (s > 0).all()
    # the outlier channel gets the largest smoothing scale (RMSNorm in
    # front of q_proj soaks up part of the outlier, so the margin is
    # moderate, but the ordering must hold)
    assert s[7] == s.max() and s[7] > 1.3 * np.median(s)


def test_smoothing_math_is_exact_in_fp():
    """y == (x/s) @ (s·W): fold + divide must be an identity before
    quantization."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    s = rng.uniform(0.5, 4.0, 16).astype(np.float32)
    np.testing.assert_allclose((x / s) @ (w * s[:, None]), x @ w,
                               rtol=1e-4, atol=1e-4)


def test_sq_e2e_and_error_reduction(outlier_model):
    from tensorrt_llm_tpu import (LLM, KvCacheConfig, QuantConfig,
                                  SamplingParams)
    from tensorrt_llm_tpu.quantization.mode import QuantAlgo

    def build(quant=None, smooth=True):
        kw = {}
        if quant:
            kw["quant_config"] = QuantConfig(quant_algo=quant,
                                             smoothquant_val=0.5)
        llm = LLM(model=outlier_model, skip_tokenizer_init=True,
                  dtype="float32", max_batch_size=4, max_input_len=64,
                  max_seq_len=128, max_num_tokens=256,
                  kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                                max_tokens=1024), **kw)
        return llm

    prompt = [5, 9, 23, 44, 17]
    sp = SamplingParams(max_tokens=8, top_k=1)

    base = build()
    ref = base.generate(prompt, sp).outputs[0].token_ids
    base.shutdown()

    sq = build(QuantAlgo.W8A8_SQ_PER_CHANNEL)
    assert getattr(sq.model, "smooth_scales", None)
    got = sq.generate(prompt, sp).outputs[0].token_ids
    sq.shutdown()
    # greedy stream survives int8 on the outlier model
    assert got[:4] == ref[:4]


def test_unsmoothed_vs_smoothed_weight_error(outlier_model):
    """Direct numeric check: per-token int8 GEMM error on an outlier
    activation drops when smoothed."""
    import torch
    from tensorrt_llm_tpu.quantization.smoothquant import (
        calibrate_smooth_scales, default_calibration_ids)
    from tensorrt_llm_tpu.ops.linear import SmoothQuantMethod
    import jax.numpy as jnp

    scales = calibrate_smooth_scales(
        outlier_model, default_calibration_ids(128), alpha=0.5)
    w_t = outlier_model.model.layers[0].self_attn.q_proj.weight
    w = w_t.detach().numpy().T.astype(np.float32)        # [K, N]
    s = scales["model.layers.0.self_attn.q_proj.weight"]

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    x[:, 7] *= 30.0                                      # outlier channel
    exact = x @ w

    m = SmoothQuantMethod()
    plain = np.asarray(m.apply(m.quantize_weights(jnp.asarray(w)),
                               jnp.asarray(x)))
    folded = m.quantize_weights(jnp.asarray(w * s[:, None]))
    folded["smooth"] = jnp.asarray(s, jnp.float32)
    smoothed = np.asarray(m.apply(folded, jnp.asarray(x)))

    err_plain = np.abs(plain - exact).mean()
    err_smooth = np.abs(smoothed - exact).mean()
    assert err_smooth < err_plain * 0.7, (err_plain, err_smooth)


def test_w4a8_qserve_roundtrip(outlier_model):
    """W4A8 (QServe two-level scaling): int4 weights on the int8 grid,
    per-token int8 activations — greedy stream survives on a tiny
    model and the method reconstructs W within int4 group error."""
    import jax.numpy as jnp
    from tensorrt_llm_tpu import (LLM, KvCacheConfig, QuantConfig,
                                  SamplingParams)
    from tensorrt_llm_tpu.quantization.mode import QuantAlgo
    from tensorrt_llm_tpu.ops.linear import W4A8QServeMethod

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    x = rng.standard_normal((4, 64)).astype(np.float32)
    m = W4A8QServeMethod(QuantConfig(group_size=32,
                                     quant_algo=QuantAlgo.W4A8_AWQ))
    m.group_size = 32
    params = m.quantize_weights(jnp.asarray(w))
    assert params["weight"].dtype == jnp.int8
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    rel = np.abs(got - x @ w).mean() / np.abs(x @ w).mean()
    assert rel < 0.12, rel    # int4 group-32 noise floor on N(0,.1)

    llm = LLM(model=outlier_model, skip_tokenizer_init=True,
              dtype="float32", max_batch_size=4, max_input_len=64,
              max_seq_len=128, max_num_tokens=256,
              quant_config=QuantConfig(quant_algo=QuantAlgo.W4A8_AWQ,
                                       group_size=32),
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    out = llm.generate([5, 9, 23, 44], SamplingParams(max_tokens=6,
                                                      top_k=1))
    assert len(out.outputs[0].token_ids) == 6
    llm.shutdown()
