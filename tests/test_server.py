"""OpenAI server endpoint tests (aiohttp test client; reference:
tests/unittest/llmapi/apps server tests)."""
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")

pytest_plugins = "aiohttp.pytest_plugin"


class FakeTokenizer:
    eos_token_id = 0
    vocab_size = 128

    def encode(self, text, add_special_tokens=True):
        return [ord(c) % 96 + 2 for c in text][:32]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)

    def apply_chat_template(self, msgs, tokenize=True,
                            add_generation_prompt=True, chat_template=None,
                            **kw):
        text = " ".join(m.get("content", "") for m in msgs)
        return self.encode(text)

    def __len__(self):
        return self.vocab_size


@pytest.fixture(scope="module")
def llm():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    llm = LLM(model=tmodel, tokenizer=FakeTokenizer(), dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    yield llm
    llm.shutdown()


@pytest.fixture()
async def client(aiohttp_client, llm):
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer
    server = OpenAIServer(llm, model_name="test-model")
    return await aiohttp_client(server.app)


async def test_health_and_models(client):
    assert (await client.get("/health")).status == 200
    r = await client.get("/v1/models")
    data = await r.json()
    assert data["data"][0]["id"] == "test-model"
    r = await client.get("/version")
    assert "version" in await r.json()


async def test_completions(client):
    r = await client.post("/v1/completions", json={
        "model": "test-model", "prompt": "hello world",
        "max_tokens": 5, "temperature": 0.0})
    assert r.status == 200
    data = await r.json()
    assert data["choices"][0]["text"]
    assert data["usage"]["completion_tokens"] == 5


async def test_chat_completions(client):
    r = await client.post("/v1/chat/completions", json={
        "model": "test-model",
        "messages": [{"role": "user", "content": "hi there"}],
        "max_tokens": 4, "temperature": 0.0})
    assert r.status == 200
    data = await r.json()
    assert data["choices"][0]["message"]["role"] == "assistant"
    assert data["choices"][0]["message"]["content"]


async def test_streaming_completions(client):
    r = await client.post("/v1/completions", json={
        "model": "test-model", "prompt": "stream me",
        "max_tokens": 4, "temperature": 0.0, "stream": True})
    assert r.status == 200
    body = await r.text()
    chunks = [l for l in body.splitlines() if l.startswith("data: ")]
    assert chunks[-1] == "data: [DONE]"
    assert len(chunks) >= 2


async def test_metrics_and_info(client):
    r = await client.get("/metrics")
    text = await r.text()
    assert "tllm_request_total" in text
    r = await client.get("/server_info")
    info = await r.json()
    assert info["max_batch_size"] == 4


async def test_bad_request(client):
    r = await client.post("/v1/completions", json={"model": "x"})
    assert r.status == 400


async def test_stop_strings(client, llm):
    """Text stop sequences terminate generation and trim the output."""
    # find what the model emits greedily, then stop on a substring of it
    base = llm.generate([5, 9, 23], __import__(
        "tensorrt_llm_tpu").SamplingParams(max_tokens=6, top_k=1))
    full_text = llm.tokenizer.decode(base.outputs[0].token_ids)
    stop = full_text.split()[2]  # third emitted word
    from tensorrt_llm_tpu import SamplingParams
    out = llm.generate([5, 9, 23], SamplingParams(
        max_tokens=6, top_k=1, stop=[stop]))
    assert stop not in out.outputs[0].text
    assert out.outputs[0].finish_reason in ("stop_words", "length")


async def test_responses_endpoint(client):
    r = await client.post("/v1/responses", json={
        "model": "m", "input": "hi there", "max_output_tokens": 6})
    assert r.status == 200
    data = await r.json()
    assert data["object"] == "response"
    assert data["status"] == "completed"
    assert data["output"][0]["content"][0]["type"] == "output_text"
    assert data["usage"]["output_tokens"] == 6
