"""Binary gRPC frontend (reference: tensorrt_llm/grpc/): pre-tokenized
input, raw token-id streaming output — for router integrations that
skip HTTP/JSON entirely. Start the server with
`python -m tensorrt_llm_tpu.commands.serve /ckpt --grpc --port 50051`."""
import asyncio

from tensorrt_llm_tpu.grpc import GrpcClient
from tensorrt_llm_tpu.grpc import tllm_service_pb2 as pb


async def main():
    client = GrpcClient("127.0.0.1:50051")
    print((await client.model_info()))
    req = pb.GenerateRequest(
        request_id="demo-1",
        input_ids=[1, 3087, 372, 263],
        streaming=True,
        sampling_params=pb.SamplingParamsProto(max_tokens=32, top_k=1))
    async for chunk in client.generate(req):
        print(list(chunk.token_ids), flush=True)
    await client.close()


if __name__ == "__main__":
    asyncio.run(main())
