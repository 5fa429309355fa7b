"""gRPC frontend: streamed generation, abort, info RPCs
(reference: tests/unittest/llmapi/test_grpc.py)."""
import asyncio

import pytest

grpc = pytest.importorskip("grpc")


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
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    yield llm
    llm.shutdown()


def test_grpc_generate_matches_llm_api(llm):
    from tensorrt_llm_tpu import SamplingParams
    from tensorrt_llm_tpu.grpc import GrpcClient, GrpcServer
    from tensorrt_llm_tpu.grpc import tllm_service_pb2 as pb

    prompt = [5, 9, 23, 44, 17]
    ref = llm.generate(prompt, SamplingParams(
        max_tokens=8, top_k=1)).outputs[0].token_ids

    async def main():
        server = GrpcServer(llm, model_name="m")
        port = await server.start(port=0)
        client = GrpcClient(f"127.0.0.1:{port}")
        try:
            # health + info RPCs
            assert (await client.health()).healthy
            info = await client.model_info()
            assert info.max_batch_size == 4 and info.vocab_size == 128
            sinfo = await client.server_info()
            assert sinfo.backend.startswith("jax/")

            # non-streaming generate
            req = pb.GenerateRequest(
                request_id="r1", input_ids=prompt,
                sampling_params=pb.SamplingParamsProto(
                    max_tokens=8, top_k=1))
            outs = [r async for r in client.generate(req)]
            assert len(outs) == 1 and outs[0].finished
            assert list(outs[0].token_ids) == ref
            assert outs[0].prompt_tokens == len(prompt)

            # streaming generate: deltas concatenate to the same ids
            req2 = pb.GenerateRequest(
                request_id="r2", input_ids=prompt, streaming=True,
                sampling_params=pb.SamplingParamsProto(
                    max_tokens=8, top_k=1))
            got = []
            async for r in client.generate(req2):
                got.extend(r.token_ids)
            assert got == ref
        finally:
            await client.close()
            await server.stop()

    asyncio.run(main())


def test_grpc_abort_unknown_request(llm):
    from tensorrt_llm_tpu.grpc import GrpcClient, GrpcServer

    async def main():
        server = GrpcServer(llm, model_name="m")
        port = await server.start(port=0)
        client = GrpcClient(f"127.0.0.1:{port}")
        try:
            resp = await client.abort("nonexistent")
            assert not resp.success
        finally:
            await client.close()
            await server.stop()

    asyncio.run(main())
