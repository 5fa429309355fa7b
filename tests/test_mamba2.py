"""Mamba2 (SSD) parity vs HF transformers + e2e generation
(reference: mamba2/chunk-scan kernel family; hybrid building block for
Nemotron-H/Bamba/Zamba2)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tests.test_models import make_prefill_metadata


def tiny_mamba2_config():
    from transformers import Mamba2Config
    return Mamba2Config(vocab_size=96, hidden_size=64, state_size=16,
                        num_hidden_layers=2, conv_kernel=4, expand=2,
                        num_heads=4, head_dim=32, n_groups=2,
                        chunk_size=8, use_cache=True)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import Mamba2ForCausalLM
    torch.manual_seed(0)
    cfg = tiny_mamba2_config()
    tmodel = Mamba2ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    mc = ModelConfig(hf_config=cfg, dtype=jnp.float32)
    model = get_model_class("mamba2")(mc)
    model._num_slots = 4
    params = model.load_hf_state_dict(sd)
    return model, params, tmodel, cfg


def hf_logits(tmodel, tokens):
    import torch
    with torch.no_grad():
        return tmodel(torch.tensor([tokens])).logits[0].numpy()


def test_mamba2_prefill_matches_hf(pair):
    model, params, tmodel, cfg = pair
    tokens = list(range(2, 14))
    md = make_prefill_metadata(model, len(tokens))
    md = md.__class__(**{**md.__dict__,
                         "seq_slots": jnp.asarray([0, -1], jnp.int32)})
    cache = model.make_kv_pages(0, 0)
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32),
                              cache, md)
    ref = hf_logits(tmodel, tokens)[-1]
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def test_mamba2_decode_matches_prefill(pair):
    """State carry: prefill T then step-by-step must equal full prefill."""
    model, params, tmodel, cfg = pair
    tokens = list(range(2, 13))
    T0 = 6
    cache = model.make_kv_pages(0, 0)

    def md_for(Tq, start):
        base = make_prefill_metadata(model, Tq, start_pos=start)
        return base.__class__(**{**base.__dict__,
                                 "seq_slots": jnp.asarray([1, -1],
                                                          jnp.int32)})

    _, cache = model.forward(params, jnp.asarray(tokens[:T0], jnp.int32),
                             cache, md_for(T0, 0))
    logits = None
    for t in range(T0, len(tokens)):
        logits, cache = model.forward(
            params, jnp.asarray([tokens[t]], jnp.int32), cache,
            md_for(1, t))
    ref = hf_logits(tmodel, tokens)[-1]
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def test_mamba2_e2e_greedy(pair):
    import torch
    _, _, tmodel, cfg = pair
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=32, max_seq_len=64,
              max_num_tokens=128,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=512))
    prompt = [5, 9, 23, 44, 17]
    out = llm.generate(prompt, SamplingParams(max_tokens=6, top_k=1))
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(6):
            logits = tmodel(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    assert out.outputs[0].token_ids == ids[len(prompt):]
    llm.shutdown()
