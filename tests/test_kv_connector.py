"""KV connector API: external prefix store supplies KV the in-device
radix tree does not hold (reference: _torch/pyexecutor/connectors/
kv_cache_connector.py + tests/unittest/_torch/executor connector
tests)."""
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


@pytest.fixture(scope="module")
def tmodel():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def _llm(tmodel, connector=None, reuse=False):
    kw = {}
    if connector is not None:
        kw["kv_connector_config"] = {"instance": connector}
    return LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=4, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             enable_block_reuse=reuse,
                                             max_tokens=1024), **kw)


def test_connector_load_path_reproduces_baseline(tmodel):
    """Save on request 1, load on request 2 (block reuse disabled so the
    connector is the only prefix source); tokens must match a
    connector-less engine exactly and the load must actually happen."""
    from tensorrt_llm_tpu.runtime.kv_connector import HostMemoryKvConnector

    prompt = list(range(2, 36))      # 34 tokens -> 2 full blocks of 16
    sp = SamplingParams(max_tokens=8, top_k=1)

    base = _llm(tmodel)
    ref = base.generate(prompt, sp).outputs[0].token_ids
    base.shutdown()

    conn = HostMemoryKvConnector(tokens_per_block=16)
    llm = _llm(tmodel, connector=conn)
    first = llm.generate(prompt, sp).outputs[0].token_ids
    assert first == ref
    assert conn.stats["saved_blocks"] > 0

    second = llm.generate(prompt, sp).outputs[0].token_ids
    assert second == ref
    assert conn.stats["loaded_blocks"] >= 2
    llm.shutdown()


def test_connector_respects_radix_reuse(tmodel):
    """With in-device reuse ON the connector must not clobber shared
    radix blocks: outputs stay exact and nothing is double-loaded."""
    from tensorrt_llm_tpu.runtime.kv_connector import HostMemoryKvConnector

    prompt = list(range(3, 37))
    sp = SamplingParams(max_tokens=6, top_k=1)

    conn = HostMemoryKvConnector(tokens_per_block=16)
    llm = _llm(tmodel, connector=conn, reuse=True)
    a = llm.generate(prompt, sp).outputs[0].token_ids
    b = llm.generate(prompt, sp).outputs[0].token_ids
    assert a == b
    # radix tree supplied the prefix; connector loads were unnecessary
    assert conn.stats["loaded_blocks"] == 0
    llm.shutdown()


def test_scheduler_output_plumbed(tmodel):
    """build_connector_meta sees each admitted request exactly once with
    its block ids."""
    from tensorrt_llm_tpu.runtime.kv_connector import HostMemoryKvConnector

    seen = []

    class Spy(HostMemoryKvConnector):
        def build_connector_meta(self, scheduler_output):
            for r in scheduler_output.new_requests:
                seen.append((r.request_id, len(r.new_block_ids)))
            return None

    conn = Spy(tokens_per_block=16)
    llm = _llm(tmodel, connector=conn)
    llm.generate([1, 2, 3, 4, 5], SamplingParams(max_tokens=4, top_k=1))
    llm.shutdown()
    assert len(seen) == 1 and seen[0][1] >= 1


def test_disk_connector_survives_restart(tmodel, tmp_path):
    """Disk-tier connector: prefixes saved by one engine re-serve from
    a FRESH engine over the same cache dir (restart recovery)."""
    from tensorrt_llm_tpu.runtime.kv_connector import DiskKvConnector

    prompt = list(range(2, 36))
    sp = SamplingParams(max_tokens=8, top_k=1)

    c1 = DiskKvConnector(tokens_per_block=16, cache_dir=str(tmp_path))
    llm1 = _llm(tmodel, connector=c1)
    ref = llm1.generate(prompt, sp).outputs[0].token_ids
    assert c1.stats["saved_blocks"] > 0
    llm1.shutdown()

    c2 = DiskKvConnector(tokens_per_block=16, cache_dir=str(tmp_path))
    assert len(c2._store) > 0          # adopted the saved blocks
    llm2 = _llm(tmodel, connector=c2)
    got = llm2.generate(prompt, sp).outputs[0].token_ids
    llm2.shutdown()
    assert got == ref
    assert c2.stats["loaded_blocks"] >= 2
