"""Disaggregated OpenAI front door: context/generation fleet orchestrator.

Behavioral reference: tensorrt_llm/serve/openai_disagg_server.py:82
(OpenAIDisaggServer: ctx request with max_tokens=1 + context_only, then
generation_only to a gen worker carrying the ctx DisaggregatedParams)
and openai_disagg_service.py. TPU-native deployment shape: each worker
is this repo's ``OpenAIServer`` (one per TPU slice), KV moves over the
pull-model ``TcpKvTransport``, and this front door is pure asyncio HTTP
— no device access.

Flow per request:
  1. pick a context server (router), POST the request with
     ``disaggregated_params.request_type=context_only``, max_tokens=1;
  2. read the first token + opaque KV endpoint from the response choice;
  3. pick a generation server, POST the original request with
     ``request_type=generation_only`` + the ctx params;
  4. relay the gen response (or SSE stream) to the client.

Conditional disaggregation (reference: disagg config
``conditional_disagg_config``): if the routers hand back the SAME
worker, skip the split and forward one context_and_generation request.
"""
from __future__ import annotations

import asyncio
import json
from typing import Optional

import aiohttp
from aiohttp import web

from ..logger import logger
from ..version import __version__
from .router import Router, create_router


class OpenAIDisaggServer:
    def __init__(self, ctx_router: Router, gen_router: Router,
                 max_retries: int = 1, req_timeout: float = 600.0):
        self.ctx_router = ctx_router
        self.gen_router = gen_router
        self.max_retries = max_retries
        self.req_timeout = req_timeout
        self._session: Optional[aiohttp.ClientSession] = None
        self.app = web.Application()
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/version", self.version)
        r.add_get("/cluster_info", self.cluster_info)
        r.add_get("/v1/models", self.models)
        r.add_post("/v1/completions", self.completions)
        r.add_post("/v1/chat/completions", self.chat_completions)
        r.add_post("/register_server", self.register_server)
        r.add_post("/deregister_server", self.deregister_server)
        self.app.on_startup.append(self._on_startup)
        self.app.on_cleanup.append(self._on_cleanup)

    # ------------------------------------------------------------------ #
    async def _on_startup(self, app) -> None:
        await self.ctx_router.start_monitoring()
        await self.gen_router.start_monitoring()

    async def _on_cleanup(self, app) -> None:
        await self.ctx_router.close()
        await self.gen_router.close()
        if self._session is not None and not self._session.closed:
            await self._session.close()

    @property
    def session(self) -> aiohttp.ClientSession:
        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=self.req_timeout))
        return self._session

    # ------------------------------------------------------------------ #
    async def health(self, request) -> web.Response:
        return web.Response(status=200)

    async def version(self, request) -> web.Response:
        return web.json_response({"version": __version__})

    async def cluster_info(self, request) -> web.Response:
        return web.json_response({
            "context_servers": self.ctx_router.servers,
            "generation_servers": self.gen_router.servers,
        })

    async def models(self, request) -> web.Response:
        for url in self.gen_router.servers:
            try:
                async with self.session.get(url + "/v1/models") as r:
                    return web.json_response(await r.json(),
                                             status=r.status)
            except Exception:
                continue
        return web.json_response({"object": "list", "data": []})

    async def register_server(self, request) -> web.Response:
        """Worker self-registration (reference: disagg_auto_scaling.py
        worker heartbeat → cluster storage). Body: {"role": "context"|
        "generation", "url": "host:port"}."""
        body = await request.json()
        router = self.ctx_router if body.get("role") == "context" \
            else self.gen_router
        await router.add_server(body["url"])
        return web.json_response({"status": "registered"})

    async def deregister_server(self, request) -> web.Response:
        body = await request.json()
        router = self.ctx_router if body.get("role") == "context" \
            else self.gen_router
        await router.remove_server(body["url"])
        return web.json_response({"status": "deregistered"})

    # ------------------------------------------------------------------ #
    async def completions(self, request: web.Request) -> web.StreamResponse:
        return await self._route(request, "/v1/completions")

    async def chat_completions(self,
                               request: web.Request) -> web.StreamResponse:
        return await self._route(request, "/v1/chat/completions")

    async def _route(self, request: web.Request,
                     path: str) -> web.StreamResponse:
        try:
            body = await request.json()
        except Exception as e:
            return web.json_response({"message": str(e)}, status=400)
        if body.get("disaggregated_params"):
            return web.json_response(
                {"message": "disaggregated_params is managed by the "
                            "disagg server"}, status=400)
        stream = bool(body.get("stream"))
        try:
            ctx_server = await self.ctx_router.get_next_server(body)
        except RuntimeError as e:
            return web.json_response({"message": str(e)}, status=503)
        try:
            gen_server = await self.gen_router.get_next_server(body)
        except RuntimeError as e:
            await self.ctx_router.finish_request(body, ctx_server)
            return web.json_response({"message": str(e)}, status=503)

        try:
            if ctx_server == gen_server:
                # conditional disagg: colocated → one aggregated pass
                return await self._forward(request, gen_server, path,
                                           body, stream)
            ctx_params = await self._run_context(ctx_server, path, body)
            gen_body = dict(body)
            gen_body["disaggregated_params"] = ctx_params
            return await self._forward(request, gen_server, path,
                                       gen_body, stream)
        except aiohttp.ClientError as e:
            return web.json_response(
                {"message": f"worker error: {e}"}, status=502)
        finally:
            await self.ctx_router.finish_request(body, ctx_server)
            await self.gen_router.finish_request(body, gen_server)

    async def _run_context(self, server: str, path: str,
                           body: dict) -> dict:
        """Phase 1: context-only prefill; returns the response's
        disaggregated_params payload (ctx id, first token, KV
        endpoint) rewritten for the generation phase."""
        ctx_body = dict(body)
        ctx_body.update(stream=False, max_tokens=1,
                        disaggregated_params={
                            "request_type": "context_only"})
        ctx_body.pop("max_completion_tokens", None)
        async with self.session.post(server + path, json=ctx_body) as r:
            if r.status != 200:
                raise aiohttp.ClientError(
                    f"ctx {server} -> {r.status}: {await r.text()}")
            data = await r.json()
        params = data["choices"][0].get("disaggregated_params")
        if not params:
            raise aiohttp.ClientError(
                f"ctx {server} returned no disaggregated_params")
        params["request_type"] = "generation_only"
        return params

    async def _forward(self, request: web.Request, server: str, path: str,
                       body: dict, stream: bool) -> web.StreamResponse:
        """Phase 2 (or aggregated passthrough): relay JSON or SSE."""
        if not stream:
            async with self.session.post(server + path, json=body) as r:
                return web.json_response(await r.json(), status=r.status)
        upstream = await self.session.post(server + path, json=body)
        if upstream.status != 200:
            payload = await upstream.text()
            upstream.release()
            return web.json_response({"message": payload},
                                     status=upstream.status)
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        try:
            async for chunk in upstream.content.iter_any():
                await resp.write(chunk)
        finally:
            upstream.release()
        await resp.write_eof()
        return resp

    # ------------------------------------------------------------------ #
    def run(self, host: str = "0.0.0.0", port: int = 8000):
        logger.info("disagg server on %s:%d (ctx=%s gen=%s)", host, port,
                    self.ctx_router.servers, self.gen_router.servers)
        web.run_app(self.app, host=host, port=port, print=None)

    async def start(self, host: str = "127.0.0.1", port: int = 8000):
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        return runner


def build_disagg_server_from_config(cfg: dict) -> OpenAIDisaggServer:
    """YAML/dict config matching the reference's disagg config shape:

    context_servers:
      urls: ["host:8001", ...]
      router: {type: round_robin|load_balancing|kv_cache_aware, ...}
    generation_servers:
      urls: ["host:8101", ...]
      router: {type: ...}
    """
    def make(section: dict) -> Router:
        rc = dict(section.get("router") or {})
        policy = rc.pop("type", "round_robin")
        return create_router(policy, section.get("urls") or [], **rc)

    return OpenAIDisaggServer(
        ctx_router=make(cfg.get("context_servers", {})),
        gen_router=make(cfg.get("generation_servers", {})),
        max_retries=int(cfg.get("max_retries", 1)))
