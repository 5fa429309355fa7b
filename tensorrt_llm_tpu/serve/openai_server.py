"""OpenAI-compatible HTTP server.

Analog of the reference ``trtllm-serve`` server (reference:
tensorrt_llm/serve/openai_server.py:598-735 endpoint set). Built on
aiohttp (fastapi is not in this image). Endpoints: /health,
/health_generate, /version, /v1/models, /metrics, /perf_metrics,
/kv_cache_events, /v1/completions, /v1/chat/completions (+SSE streaming).
"""
from __future__ import annotations

import asyncio
import dataclasses
import json
import time
from typing import Any, AsyncIterator, Optional

from aiohttp import web

from ..llmapi.llm import LLM
from ..logger import logger
from ..sampling_params import SamplingParams
from ..version import __version__
from .openai_protocol import (ChatCompletionRequest, ChatCompletionResponse,
                              ChatCompletionResponseChoice,
                              ChatCompletionStreamChoice,
                              ChatCompletionStreamResponse, ChatMessage,
                              CompletionRequest, CompletionResponse,
                              CompletionResponseChoice, DeltaMessage,
                              ErrorResponse, ModelCard, ModelList, UsageInfo)


class OpenAIServer:
    def __init__(self, llm: LLM, model_name: str = "tllm-tpu-model",
                 tool_parser: Optional[str] = None):
        self.llm = llm
        self.model_name = model_name
        # tool-call extraction from generated text (reference:
        # serve/tool_parser/); name from --tool_parser
        self.tool_parser = None
        if tool_parser:
            from .tool_parser import create_tool_parser
            self.tool_parser = create_tool_parser(tool_parser)
        # GPT-OSS speaks harmony (serve/harmony.py; reference:
        # harmony_adapter.py): channeled prompts + channeled output
        # parsing on chat/responses
        mt = getattr(getattr(getattr(llm, "model", None), "hf", None),
                     "model_type", "")
        self.use_harmony = mt == "gpt_oss"
        self.app = web.Application()
        self._num_requests = 0
        self._num_tokens_out = 0
        self._start_time = time.time()
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/version", self.version)
        r.add_get("/v1/models", self.models)
        r.add_get("/metrics", self.metrics)
        r.add_get("/perf_metrics", self.perf_metrics)
        r.add_get("/kv_cache_events", self.kv_cache_events)
        r.add_post("/v1/completions", self.completions)
        r.add_post("/v1/chat/completions", self.chat_completions)
        r.add_post("/v1/responses", self.responses)
        r.add_post("/release_memory", self.release_memory)
        r.add_post("/resume_memory", self.resume_memory)
        r.add_post("/update_weights", self.update_weights)
        r.add_get("/server_info", self.server_info)

    # ------------------------------------------------------------------ #
    async def health(self, request) -> web.Response:
        return web.Response(status=200)

    async def health_generate(self, request) -> web.Response:
        try:
            out = await self._generate_async([1, 2, 3],
                                             SamplingParams(max_tokens=1))
            assert out.outputs
            return web.Response(status=200)
        except Exception as e:
            return web.Response(status=500, text=str(e))

    async def version(self, request) -> web.Response:
        return web.json_response({"version": __version__})

    async def models(self, request) -> web.Response:
        return web.json_response(
            ModelList(data=[ModelCard(id=self.model_name)]).model_dump())

    async def metrics(self, request) -> web.Response:
        """Prometheus text exposition (reference: metrics/collector.py)."""
        stats = self.llm.executor.stats_history
        last = stats[-1] if stats else None
        kv = self.llm.kv_cache_manager.get_stats()
        lines = [
            "# TYPE tllm_request_total counter",
            f"tllm_request_total {self._num_requests}",
            "# TYPE tllm_generated_tokens_total counter",
            f"tllm_generated_tokens_total {self._num_tokens_out}",
            "# TYPE tllm_kv_cache_free_blocks gauge",
            f"tllm_kv_cache_free_blocks {kv.free_blocks}",
            "# TYPE tllm_kv_cache_hit_rate gauge",
            f"tllm_kv_cache_hit_rate {kv.cache_hit_rate:.4f}",
        ]
        if last:
            lines += [
                "# TYPE tllm_iter_latency_ms gauge",
                f"tllm_iter_latency_ms {last.iter_latency_ms:.3f}",
                "# TYPE tllm_active_requests gauge",
                f"tllm_active_requests {last.num_active_requests}",
            ]
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def perf_metrics(self, request) -> web.Response:
        stats = [dataclasses.asdict(s)
                 for s in self.llm.executor.stats_history[-100:]]
        return web.json_response(stats)

    async def kv_cache_events(self, request) -> web.Response:
        events = [dataclasses.asdict(e)
                  for e in self.llm.kv_cache_manager.get_latest_events()]
        return web.json_response(events)

    async def release_memory(self, request) -> web.Response:
        try:
            self.llm.release_memory()
            return web.json_response({"status": "sleeping"})
        except Exception as e:
            return self._error(str(e), 409)

    async def resume_memory(self, request) -> web.Response:
        self.llm.resume_memory()
        return web.json_response({"status": "awake"})

    async def update_weights(self, request) -> web.Response:
        """RLHF weight hot-swap from a safetensors checkpoint dir
        (reference: /update_weights, rlhf_utils)."""
        try:
            body = await request.json()
            path = body["checkpoint_dir"]
            from pathlib import Path
            from safetensors import numpy as st_numpy
            sd = {}
            for f in sorted(Path(path).glob("*.safetensors")):
                sd.update(st_numpy.load_file(str(f)))
            if not sd:
                return self._error(f"no safetensors under {path}", 400)
            loop = asyncio.get_running_loop()
            await loop.run_in_executor(None, self.llm.update_weights, sd)
            return web.json_response({"status": "updated",
                                      "num_tensors": len(sd)})
        except Exception as e:
            return self._error(str(e), 400)

    async def server_info(self, request) -> web.Response:
        eng = self.llm.engine
        return web.json_response({
            "model": self.model_name,
            "version": __version__,
            "max_batch_size": eng.max_batch_size,
            "kv_pages": eng.num_kv_pages,
            "page_size": eng.page_size,
            "token_buckets": eng.token_buckets,
            "backend": "jax/" + __import__("jax").default_backend(),
        })

    # ------------------------------------------------------------------ #
    async def _generate_async(self, prompt, sampling_params, streaming=False,
                              disaggregated_params=None,
                              trace_headers=None):
        loop = asyncio.get_running_loop()
        fut = self.llm.generate_async(
            prompt, sampling_params, streaming=streaming,
            disaggregated_params=disaggregated_params,
            trace_headers=trace_headers)
        if streaming:
            return fut
        return await loop.run_in_executor(None, lambda: fut.result(3600))

    def _ctx_response_params(self, out):
        """DisaggregatedParams payload for a finished context-only
        request: id + first token + this engine's KV pull endpoint
        (reference: ctx response carries ctx_request_id/opaque state,
        openai_disagg_server.py send_context_request)."""
        import msgpack
        from ..disaggregation import DisaggregatedParams
        from .openai_protocol import DisaggregatedParamsPayload
        opaque = None
        ep = getattr(self.llm, "kv_endpoint", None)
        if ep is not None:
            opaque = msgpack.packb({"kv_host": ep[0], "kv_port": ep[1]},
                                   use_bin_type=True)
        return DisaggregatedParamsPayload.from_params(DisaggregatedParams(
            request_type="context_only",
            ctx_request_id=out.request_id,
            first_gen_tokens=list(out.outputs[0].token_ids),
            opaque_state=opaque))

    async def completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = CompletionRequest(**await request.json())
        except Exception as e:
            return self._error(str(e))
        prompts = body.prompt
        if isinstance(prompts, str) or (
                isinstance(prompts, list) and prompts
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        sp = body.to_sampling_params()
        self._num_requests += 1
        dp = body.disaggregated_params.to_params() \
            if body.disaggregated_params else None
        if body.stream:
            return await self._stream_completion(request, body, prompts[0],
                                                 sp, dp)
        outs = await asyncio.gather(*[
            self._generate_async(p, sp, disaggregated_params=dp,
                                 trace_headers=request.headers)
            for p in prompts])
        choices, usage = [], UsageInfo()
        is_ctx = dp is not None and dp.request_type == "context_only"
        for i, out in enumerate(outs):
            o = out.outputs[0]
            text = o.text or " ".join(map(str, o.token_ids))
            choices.append(CompletionResponseChoice(
                index=i, text=text, token_ids=list(o.token_ids),
                finish_reason=o.finish_reason,
                disaggregated_params=(self._ctx_response_params(out)
                                      if is_ctx else None)))
            usage.prompt_tokens += len(out.prompt_token_ids)
            usage.completion_tokens += len(o.token_ids)
            self._num_tokens_out += len(o.token_ids)
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        resp = CompletionResponse(model=body.model, choices=choices,
                                  usage=usage)
        return web.json_response(resp.model_dump())

    async def _stream_completion(self, request, body, prompt, sp, dp=None):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        fut = await self._generate_async(prompt, sp, streaming=True,
                                         disaggregated_params=dp)
        loop = asyncio.get_running_loop()
        it = iter(fut)
        while True:
            chunk = await loop.run_in_executor(None, next, it, None)
            if chunk is None:
                break
            text = chunk.text or " ".join(map(str, chunk.token_ids)) + " "
            self._num_tokens_out += len(chunk.token_ids)
            payload = CompletionResponse(
                model=body.model,
                choices=[CompletionResponseChoice(index=0, text=text)])
            await resp.write(
                f"data: {payload.model_dump_json()}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = ChatCompletionRequest(**await request.json())
        except Exception as e:
            return self._error(str(e))
        tokenizer = self.llm.tokenizer
        if tokenizer is None:
            return self._error("chat endpoint requires a tokenizer")
        msgs = [m.model_dump(exclude_none=True) for m in body.messages]
        if self.use_harmony:
            from .harmony import STOP_STRINGS, render_prompt
            text = render_prompt(msgs, tools=body.tools)
            prompt_ids = tokenizer.encode(text,
                                          add_special_tokens=False)
        else:
            try:
                prompt_ids = tokenizer.apply_chat_template(
                    msgs, tokenize=True,
                    add_generation_prompt=body.add_generation_prompt,
                    chat_template=body.chat_template,
                    **(body.chat_template_kwargs or {}))
            except Exception:
                text = "\n".join(f"{m['role']}: {m.get('content','')}"
                                 for m in msgs) + "\nassistant:"
                prompt_ids = tokenizer.encode(text)
        sp = body.to_sampling_params()
        if self.use_harmony:
            from .harmony import STOP_STRINGS
            sp.stop = list(sp.stop or []) + STOP_STRINGS
        self._num_requests += 1
        dp = body.disaggregated_params.to_params() \
            if body.disaggregated_params else None
        if body.stream:
            return await self._stream_chat(request, body, prompt_ids, sp, dp)
        out = await self._generate_async(prompt_ids, sp,
                                         disaggregated_params=dp)
        o = out.outputs[0]
        self._num_tokens_out += len(o.token_ids)
        usage = UsageInfo(
            prompt_tokens=len(prompt_ids),
            completion_tokens=len(o.token_ids),
            total_tokens=len(prompt_ids) + len(o.token_ids))
        is_ctx = dp is not None and dp.request_type == "context_only"
        content, tool_calls, finish = o.text, None, o.finish_reason
        reasoning = None
        if self.use_harmony:
            from .harmony import parse_output
            parsed = parse_output(o.text or "")
            content = parsed["content"] or None
            reasoning = parsed["reasoning"]
            if parsed["tool_calls"]:
                tool_calls = [{
                    "id": f"call_{i}", "type": "function",
                    "function": {"name": c["name"],
                                 "arguments": c["arguments"]}}
                    for i, c in enumerate(parsed["tool_calls"])]
                finish = "tool_calls"
        if self.tool_parser is not None and body.tools \
                and not self.use_harmony:
            parsed = self.tool_parser.parse(o.text or "")
            if parsed.tool_calls:
                content = parsed.content or None
                tool_calls = [c.to_openai() for c in parsed.tool_calls]
                finish = "tool_calls"
        resp = ChatCompletionResponse(
            model=body.model,
            choices=[ChatCompletionResponseChoice(
                index=0,
                message=ChatMessage(role="assistant", content=content,
                                    reasoning_content=reasoning,
                                    tool_calls=tool_calls),
                finish_reason=finish,
                disaggregated_params=(self._ctx_response_params(out)
                                      if is_ctx else None))],
            usage=usage)
        return web.json_response(resp.model_dump())

    async def responses(self, request: web.Request) -> web.Response:
        """OpenAI Responses API, minimal surface (reference:
        serve/openai_server.py /v1/responses + responses_utils.py):
        ``input`` as a string or message list -> one assistant message."""
        try:
            body = await request.json()
        except Exception as e:
            return self._error(str(e))
        tokenizer = self.llm.tokenizer
        inp = body.get("input", "")
        if isinstance(inp, str):
            msgs = [{"role": "user", "content": inp}]
        else:
            msgs = [{"role": m.get("role", "user"),
                     "content": m.get("content", "")} for m in inp]
        if body.get("instructions"):
            msgs.insert(0, {"role": "system",
                            "content": body["instructions"]})
        if tokenizer is None:
            return self._error("responses endpoint requires a tokenizer")
        if self.use_harmony:
            from .harmony import render_prompt
            effort = (body.get("reasoning") or {}).get("effort", "medium")
            text = render_prompt(msgs, tools=body.get("tools"),
                                 reasoning_effort=effort)
            prompt_ids = tokenizer.encode(text, add_special_tokens=False)
        else:
            try:
                prompt_ids = tokenizer.apply_chat_template(
                    msgs, tokenize=True, add_generation_prompt=True)
            except Exception:
                text = "\n".join(f"{m['role']}: {m['content']}"
                                 for m in msgs) + "\nassistant:"
                prompt_ids = tokenizer.encode(text)
        from ..sampling_params import SamplingParams as SP
        sp = SP(max_tokens=body.get("max_output_tokens", 512),
                temperature=body.get("temperature", 1.0),
                top_p=body.get("top_p", 1.0))
        if self.use_harmony:
            from .harmony import STOP_STRINGS
            sp.stop = STOP_STRINGS
        self._num_requests += 1
        out = await self._generate_async(prompt_ids, sp)
        o = out.outputs[0]
        self._num_tokens_out += len(o.token_ids)
        import time as _time
        import uuid as _uuid
        return web.json_response({
            "id": "resp_" + _uuid.uuid4().hex,
            "object": "response",
            "created_at": int(_time.time()),
            "status": "completed",
            "model": body.get("model", self.model_name),
            "output": self._responses_output(o.text),
            "usage": {"input_tokens": len(out.prompt_token_ids),
                      "output_tokens": len(o.token_ids),
                      "total_tokens": len(out.prompt_token_ids)
                      + len(o.token_ids)},
        })

    def _responses_output(self, text: str) -> list:
        """Responses-API output items; harmony models contribute a
        reasoning item + function_call items from channel parsing."""
        items = []
        content = text
        if self.use_harmony:
            from .harmony import parse_output
            parsed = parse_output(text or "")
            if parsed["reasoning"]:
                items.append({
                    "type": "reasoning",
                    "summary": [],
                    "content": [{"type": "reasoning_text",
                                 "text": parsed["reasoning"]}]})
            for i, c in enumerate(parsed["tool_calls"]):
                items.append({"type": "function_call",
                              "call_id": f"call_{i}",
                              "name": c["name"],
                              "arguments": c["arguments"],
                              "status": "completed"})
            content = parsed["content"]
        items.append({
            "type": "message", "role": "assistant",
            "status": "completed",
            "content": [{"type": "output_text", "text": content,
                         "annotations": []}],
        })
        return items

    async def _stream_chat(self, request, body, prompt_ids, sp, dp=None):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        first = ChatCompletionStreamResponse(
            model=body.model,
            choices=[ChatCompletionStreamChoice(
                index=0, delta=DeltaMessage(role="assistant"))])
        await resp.write(f"data: {first.model_dump_json()}\n\n".encode())
        fut = await self._generate_async(prompt_ids, sp, streaming=True,
                                         disaggregated_params=dp)
        loop = asyncio.get_running_loop()
        it = iter(fut)
        while True:
            chunk = await loop.run_in_executor(None, next, it, None)
            if chunk is None:
                break
            self._num_tokens_out += len(chunk.token_ids)
            payload = ChatCompletionStreamResponse(
                model=body.model,
                choices=[ChatCompletionStreamChoice(
                    index=0, delta=DeltaMessage(content=chunk.text))])
            await resp.write(
                f"data: {payload.model_dump_json()}\n\n".encode())
        done = ChatCompletionStreamResponse(
            model=body.model,
            choices=[ChatCompletionStreamChoice(
                index=0, delta=DeltaMessage(), finish_reason="stop")])
        await resp.write(f"data: {done.model_dump_json()}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _error(self, msg: str, code: int = 400) -> web.Response:
        return web.json_response(
            ErrorResponse(message=msg, code=code).model_dump(), status=code)

    # ------------------------------------------------------------------ #
    def run(self, host: str = "0.0.0.0", port: int = 8000):
        logger.info("serving on %s:%d", host, port)
        web.run_app(self.app, host=host, port=port, print=None)

    async def start(self, host: str = "127.0.0.1", port: int = 8000):
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        return runner
