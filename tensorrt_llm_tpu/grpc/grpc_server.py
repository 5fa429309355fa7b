"""gRPC frontend over the LLM API.

Behavioral reference: tensorrt_llm/grpc/grpc_servicer.py:43 +
grpc_request_manager.py:1 — a binary, pre-tokenized interface for
external routers (no HTTP/JSON/tokenization overhead): Generate streams
delta token ids; Abort cancels; HealthCheck/GetModelInfo/GetServerInfo
probe state.

The service is registered with generic method handlers instead of
protoc-generated service stubs (only the protobuf *message* codegen is
vendored — ``tllm_service_pb2.py`` from ``tllm_service.proto``), which
keeps the build free of the grpcio-tools plugin.
"""
from __future__ import annotations

import asyncio
import threading
from typing import AsyncIterator, Dict, Optional

import grpc

from ..logger import logger
from ..sampling_params import SamplingParams
from ..version import __version__
from . import tllm_service_pb2 as pb

_SERVICE = "tllm_tpu.TllmTpuService"


def sampling_params_from_proto(p: pb.SamplingParamsProto) -> SamplingParams:
    """Proto → SamplingParams (reference:
    grpc_request_manager.py create_sampling_params_from_proto)."""
    return SamplingParams(
        max_tokens=p.max_tokens or 16,
        temperature=p.temperature if p.temperature > 0 else 1.0,
        top_p=p.top_p if p.top_p > 0 else 1.0,
        top_k=p.top_k,
        min_p=p.min_p,
        seed=p.seed if p.HasField("seed") else None,
        stop_token_ids=list(p.stop_token_ids) or None,
        end_id=p.end_id if p.HasField("end_id") else None,
        ignore_eos=p.ignore_eos,
        presence_penalty=p.presence_penalty,
        frequency_penalty=p.frequency_penalty,
        repetition_penalty=p.repetition_penalty or 1.0,
        min_tokens=p.min_tokens,
        logprobs=p.logprobs if p.HasField("logprobs") else None,
        detokenize=False)


class GrpcServer:
    def __init__(self, llm, model_name: str = "tllm-tpu-model"):
        self.llm = llm
        self.model_name = model_name
        self._active: Dict[str, int] = {}   # client rid -> engine rid
        self._lock = threading.Lock()
        self.server: Optional[grpc.aio.Server] = None

    # -- RPC implementations --------------------------------------------
    async def Generate(self, request: pb.GenerateRequest,
                       context) -> AsyncIterator[pb.GenerateResponse]:
        sp = sampling_params_from_proto(request.sampling_params)
        rid = request.request_id
        loop = asyncio.get_running_loop()
        fut = self.llm.generate_async(
            list(request.input_ids), sp, streaming=request.streaming,
            cache_salt=request.cache_salt or None)
        with self._lock:
            self._active[rid] = fut.request_id
        try:
            if request.streaming:
                it = iter(fut)
                while True:
                    chunk = await loop.run_in_executor(None, next, it, None)
                    if chunk is None:
                        break
                    yield pb.GenerateResponse(
                        request_id=rid,
                        token_ids=list(chunk.token_ids),
                        finished=chunk.finish_reason is not None,
                        finish_reason=chunk.finish_reason or "")
            else:
                out = await loop.run_in_executor(
                    None, lambda: fut.result(3600))
                o = out.outputs[0]
                lps = []
                for lp in (o.logprobs or []):
                    # per-token entries may be floats or {id: logprob}
                    if isinstance(lp, dict):
                        lps.append(float(max(lp.values())) if lp else 0.0)
                    elif lp is not None:
                        lps.append(float(lp))
                yield pb.GenerateResponse(
                    request_id=rid,
                    token_ids=list(o.token_ids),
                    finished=True,
                    finish_reason=o.finish_reason or "",
                    logprobs=lps,
                    prompt_tokens=len(out.prompt_token_ids))
        finally:
            with self._lock:
                self._active.pop(rid, None)

    async def HealthCheck(self, request, context) -> pb.HealthCheckResponse:
        return pb.HealthCheckResponse(healthy=True)

    async def Abort(self, request: pb.AbortRequest,
                    context) -> pb.AbortResponse:
        with self._lock:
            engine_rid = self._active.get(request.request_id)
        if engine_rid is None:
            return pb.AbortResponse(success=False)
        self.llm.executor.cancel(engine_rid)
        return pb.AbortResponse(success=True)

    async def GetModelInfo(self, request, context) -> pb.ModelInfoResponse:
        eng = self.llm.engine
        return pb.ModelInfoResponse(
            model=self.model_name,
            max_batch_size=eng.max_batch_size,
            max_seq_len=self.llm.args.max_seq_len,
            vocab_size=self.llm.model.vocab_size)

    async def GetServerInfo(self, request, context) -> pb.ServerInfoResponse:
        import jax
        kv = self.llm.kv_cache_manager.get_stats()
        with self._lock:
            n = len(self._active)
        return pb.ServerInfoResponse(
            version=__version__,
            backend="jax/" + jax.default_backend(),
            num_active_requests=n,
            kv_free_blocks=kv.free_blocks)

    # -- registration ----------------------------------------------------
    def _handlers(self) -> grpc.GenericRpcHandler:
        def u(m, req_cls):     # unary-unary
            return grpc.unary_unary_rpc_method_handler(
                m, request_deserializer=req_cls.FromString,
                response_serializer=lambda r: r.SerializeToString())

        def s(m, req_cls):     # unary-stream
            return grpc.unary_stream_rpc_method_handler(
                m, request_deserializer=req_cls.FromString,
                response_serializer=lambda r: r.SerializeToString())

        return grpc.method_handlers_generic_handler(_SERVICE, {
            "Generate": s(self.Generate, pb.GenerateRequest),
            "HealthCheck": u(self.HealthCheck, pb.HealthCheckRequest),
            "Abort": u(self.Abort, pb.AbortRequest),
            "GetModelInfo": u(self.GetModelInfo, pb.ModelInfoRequest),
            "GetServerInfo": u(self.GetServerInfo, pb.ServerInfoRequest),
        })

    async def start(self, host: str = "127.0.0.1",
                    port: int = 50051) -> int:
        self.server = grpc.aio.server()
        self.server.add_generic_rpc_handlers((self._handlers(),))
        bound = self.server.add_insecure_port(f"{host}:{port}")
        await self.server.start()
        logger.info("gRPC frontend on %s:%d", host, bound)
        return bound

    async def stop(self, grace: float = 1.0) -> None:
        if self.server is not None:
            await self.server.stop(grace)

    def run(self, host: str = "0.0.0.0", port: int = 50051) -> None:
        async def _main():
            await self.start(host, port)
            await self.server.wait_for_termination()
        asyncio.run(_main())


class GrpcClient:
    """Thin test/router client over the same generic method descriptors."""

    def __init__(self, target: str):
        self.channel = grpc.aio.insecure_channel(target)

    def _u(self, name, resp_cls):
        return self.channel.unary_unary(
            f"/{_SERVICE}/{name}",
            request_serializer=lambda r: r.SerializeToString(),
            response_deserializer=resp_cls.FromString)

    def generate(self, request: pb.GenerateRequest):
        return self.channel.unary_stream(
            f"/{_SERVICE}/Generate",
            request_serializer=lambda r: r.SerializeToString(),
            response_deserializer=pb.GenerateResponse.FromString)(request)

    async def health(self) -> pb.HealthCheckResponse:
        return await self._u("HealthCheck", pb.HealthCheckResponse)(
            pb.HealthCheckRequest())

    async def abort(self, request_id: str) -> pb.AbortResponse:
        return await self._u("Abort", pb.AbortResponse)(
            pb.AbortRequest(request_id=request_id))

    async def model_info(self) -> pb.ModelInfoResponse:
        return await self._u("GetModelInfo", pb.ModelInfoResponse)(
            pb.ModelInfoRequest())

    async def server_info(self) -> pb.ServerInfoResponse:
        return await self._u("GetServerInfo", pb.ServerInfoResponse)(
            pb.ServerInfoRequest())

    async def close(self) -> None:
        await self.channel.close()
