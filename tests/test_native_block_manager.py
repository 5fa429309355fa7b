"""Parity tests: native C++ block manager vs the python reference
(the reference's own strategy — C++ kvCacheManagerTest mirrors the
python-visible semantics)."""
import subprocess
from pathlib import Path

import pytest

from tensorrt_llm_tpu.runtime.kv_cache_manager import (KVCacheManager,
                                                       NoFreeBlocksError)
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.sampling_params import SamplingParams

CPP_DIR = Path(__file__).resolve().parent.parent / "cpp"


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", str(CPP_DIR)], check=True,
                   capture_output=True)
    from tensorrt_llm_tpu.runtime.native_block_manager import \
        NativeKVCacheManager
    assert NativeKVCacheManager.available()


def make_req(tokens, max_tokens=8, **kw):
    return LlmRequest(prompt_token_ids=list(tokens),
                      sampling_params=SamplingParams(max_tokens=max_tokens),
                      **kw)


def both():
    from tensorrt_llm_tpu.runtime.native_block_manager import \
        NativeKVCacheManager
    return [KVCacheManager(num_blocks=32, tokens_per_block=4),
            NativeKVCacheManager(num_blocks=32, tokens_per_block=4)]


def test_allocation_parity():
    for kv in both():
        req = make_req(range(10))
        assert kv.add_sequence(req) == 0
        assert len(req.kv_block_ids) == 3
        assert kv.get_num_free_blocks() == 29
        kv.free_resources(req, store_for_reuse=False)
        assert kv.get_num_free_blocks() == 32


def test_prefix_reuse_parity():
    for kv in both():
        a = make_req(list(range(12)))
        kv.add_sequence(a)
        a_blocks = list(a.kv_block_ids)
        kv.free_resources(a)
        b = make_req(list(range(8)) + [99, 98, 97, 96])
        reused = kv.add_sequence(b)
        assert reused == 8, type(kv).__name__
        assert b.kv_block_ids[:2] == a_blocks[:2]


def test_salt_isolation_parity():
    for kv in both():
        a = make_req(list(range(12)), cache_salt="t1")
        kv.add_sequence(a)
        kv.free_resources(a)
        b = make_req(list(range(12)), cache_salt="t2")
        assert kv.add_sequence(b) == 0
        c = make_req(list(range(12)), cache_salt="t1")
        assert kv.add_sequence(c) == 8


def test_eviction_parity():
    from tensorrt_llm_tpu.runtime.native_block_manager import \
        NativeKVCacheManager
    for cls in (KVCacheManager, NativeKVCacheManager):
        kv = cls(num_blocks=4, tokens_per_block=4)
        a = make_req(list(range(8)))
        kv.add_sequence(a)
        kv.free_resources(a)
        b = make_req(list(range(100, 116)))
        kv.add_sequence(b)
        assert len(b.kv_block_ids) == 4
        c = make_req(list(range(200, 208)))
        with pytest.raises(NoFreeBlocksError):
            kv.add_sequence(c)


def test_grow_and_rewind_parity():
    for kv in both():
        req = make_req(list(range(8)))
        kv.add_sequence(req)
        req.output_token_ids = list(range(5))
        kv.add_token(req)
        kv.add_draft_tokens(req, 3)
        n = len(req.kv_block_ids)
        req.output_token_ids = req.output_token_ids[:1]
        kv.rewind_tokens(req, 0)
        assert len(req.kv_block_ids) <= n


def test_native_e2e_executor():
    """Run the tiny-llama e2e path on the native manager."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams as SP
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    import os
    os.environ["TLLM_TPU_NATIVE"] = "1"
    try:
        llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
                  max_batch_size=4, max_input_len=64, max_seq_len=128,
                  max_num_tokens=256,
                  kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                                max_tokens=1024))
        assert type(llm.kv_cache_manager).__name__ == "NativeKVCacheManager"
        out1 = llm.generate([5, 9, 23, 44], SP(max_tokens=6, top_k=1))
        out2 = llm.generate([5, 9, 23, 44], SP(max_tokens=6, top_k=1))
        assert out1.outputs[0].token_ids == out2.outputs[0].token_ids
        llm.shutdown()
    finally:
        os.environ.pop("TLLM_TPU_NATIVE", None)
