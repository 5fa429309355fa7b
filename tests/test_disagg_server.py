"""Disaggregated front-door server + routers.

Covers (reference: tensorrt_llm/serve/router.py, openai_disagg_server.py
and tests/unittest/disaggregated/test_router.py):
  * router policies — round robin, least-loaded, KV-cache-aware scoring
  * stable block hashes: router-side prediction == worker kv events
  * end-to-end: ctx worker + gen worker (separate LLMs, TCP pull KV
    transport) behind OpenAIDisaggServer == single-engine greedy output
"""
import asyncio
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")

pytest_plugins = "aiohttp.pytest_plugin"


# --------------------------------------------------------------------- #
# Router unit tests
# --------------------------------------------------------------------- #
def _run(coro):
    return asyncio.get_event_loop().run_until_complete(coro)


async def test_round_robin_rotation():
    from tensorrt_llm_tpu.serve.router import create_router
    r = create_router("round_robin", ["a:1", "b:2"])
    req = {"prompt": "hi", "max_tokens": 4}
    picks = [await r.get_next_server(req) for _ in range(4)]
    assert picks == ["http://a:1", "http://b:2",
                     "http://a:1", "http://b:2"]
    await r.close()


async def test_load_balancing_prefers_idle():
    from tensorrt_llm_tpu.serve.router import create_router
    r = create_router("load_balancing", ["a:1", "b:2"])
    big = {"prompt": [1] * 64, "max_tokens": 64}
    small = {"prompt": [1, 2], "max_tokens": 2}
    s1 = await r.get_next_server(big)       # a gets the heavy one
    s2 = await r.get_next_server(small)     # b is now lighter
    assert s2 != s1
    s3 = await r.get_next_server(small)     # b still lighter (128 vs 8)
    assert s3 == s2
    await r.finish_request(big, s1)
    s4 = await r.get_next_server(small)     # a drained → lightest again
    assert s4 == s1
    await r.close()


async def test_kv_aware_prefers_prefix_holder():
    from tensorrt_llm_tpu.serve.router import create_router
    r = create_router("kv_cache_aware", ["a:1", "b:2"],
                      tokens_per_block=4, load_penalty=0.0)
    prompt = list(range(1, 13))             # 3 full blocks
    hashes = r.block_hashes_for(prompt)
    assert len(hashes) == 3
    # server b holds the first two blocks
    r._states["http://b:2"].apply_events([
        {"event_id": 1, "kind": "stored", "block_hashes": hashes[:2]}])
    assert await r.get_next_server({"prompt": prompt}) == "http://b:2"
    # removal flips the preference under load tie-breaking
    r._states["http://b:2"].apply_events([
        {"event_id": 2, "kind": "removed", "block_hashes": hashes[:2]}])
    r._states["http://a:1"].apply_events([
        {"event_id": 1, "kind": "stored", "block_hashes": hashes[:1]}])
    assert await r.get_next_server({"prompt": prompt}) == "http://a:1"
    await r.close()


def test_stable_hash_matches_kv_manager_events():
    """The router must predict exactly the hashes the worker's KV manager
    publishes for a freed sequence (stable chained sha, not hash())."""
    from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.sampling_params import SamplingParams
    from tensorrt_llm_tpu.serve.router import KvCacheAwareRouter

    kv = KVCacheManager(num_blocks=16, tokens_per_block=4,
                        event_buffer_max_size=64)
    req = LlmRequest(prompt_token_ids=list(range(10, 22)),
                     sampling_params=SamplingParams(max_tokens=4))
    kv.add_sequence(req)
    kv.free_resources(req)
    stored = [h for ev in kv.get_latest_events() if ev.kind == "stored"
              for h in ev.block_hashes]
    router = KvCacheAwareRouter(["x:1"], tokens_per_block=4)
    assert stored == router.block_hashes_for(req.prompt_token_ids)


# --------------------------------------------------------------------- #
# End-to-end: ctx + gen workers behind the front door
# --------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def tmodel():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def _make_llm(tmodel, tcp_port=None):
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import CacheTransceiverConfig
    kw = {}
    if tcp_port is not None:
        kw["cache_transceiver_config"] = CacheTransceiverConfig(
            backend="tcp", listen_port=tcp_port)
    return LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=4, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=1024), **kw)


async def test_disagg_e2e_matches_single_engine(aiohttp_server, tmodel):
    from tensorrt_llm_tpu import SamplingParams
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer
    from tensorrt_llm_tpu.serve.openai_disagg_server import (
        OpenAIDisaggServer)
    from tensorrt_llm_tpu.serve.router import create_router

    prompt = [5, 9, 23, 44, 17, 3, 77]
    single = _make_llm(tmodel)
    ref = single.generate(prompt, SamplingParams(
        max_tokens=9, top_k=1)).outputs[0].token_ids
    single.shutdown()

    ctx_llm = _make_llm(tmodel, tcp_port=0)   # ephemeral pull listener
    gen_llm = _make_llm(tmodel, tcp_port=0)
    assert ctx_llm.kv_endpoint is not None
    try:
        ctx_srv = await aiohttp_server(
            OpenAIServer(ctx_llm, model_name="m").app)
        gen_srv = await aiohttp_server(
            OpenAIServer(gen_llm, model_name="m").app)
        front = OpenAIDisaggServer(
            ctx_router=create_router(
                "round_robin", [f"127.0.0.1:{ctx_srv.port}"]),
            gen_router=create_router(
                "round_robin", [f"127.0.0.1:{gen_srv.port}"]))
        front_srv = await aiohttp_server(front.app)

        async with aiohttp.ClientSession() as sess:
            async with sess.post(
                    f"http://127.0.0.1:{front_srv.port}/v1/completions",
                    json={"model": "m", "prompt": prompt,
                          "max_tokens": 9, "top_k": 1}) as r:
                assert r.status == 200, await r.text()
                data = await r.json()
        got = data["choices"][0]["token_ids"]
        assert got == ref

        # cluster introspection + dynamic registration surface
        async with aiohttp.ClientSession() as sess:
            async with sess.get(f"http://127.0.0.1:{front_srv.port}"
                                "/cluster_info") as r:
                info = await r.json()
        assert info["context_servers"] == \
            [f"http://127.0.0.1:{ctx_srv.port}"]
    finally:
        ctx_llm.shutdown()
        gen_llm.shutdown()


async def test_disagg_streaming_relay(aiohttp_server, tmodel):
    """SSE streams from the gen worker pass through the front door."""
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer
    from tensorrt_llm_tpu.serve.openai_disagg_server import (
        OpenAIDisaggServer)
    from tensorrt_llm_tpu.serve.router import create_router

    llm = _make_llm(tmodel, tcp_port=0)
    try:
        worker = await aiohttp_server(OpenAIServer(llm, "m").app)
        url = f"127.0.0.1:{worker.port}"
        # same worker for ctx+gen → conditional-disagg passthrough
        front = OpenAIDisaggServer(
            ctx_router=create_router("round_robin", [url]),
            gen_router=create_router("round_robin", [url]))
        front_srv = await aiohttp_server(front.app)
        chunks = []
        async with aiohttp.ClientSession() as sess:
            async with sess.post(
                    f"http://127.0.0.1:{front_srv.port}/v1/completions",
                    json={"model": "m", "prompt": [5, 9, 23],
                          "max_tokens": 5, "top_k": 1,
                          "stream": True}) as r:
                assert r.status == 200
                async for line in r.content:
                    line = line.decode().strip()
                    if line.startswith("data: "):
                        chunks.append(line[6:])
        assert chunks[-1] == "[DONE]"
        assert len(chunks) > 1
    finally:
        llm.shutdown()
