"""Diffusion pipeline + executor (reference:
tensorrt_llm/visual_gen/visual_gen.py VisualGen facade,
_torch/visual_gen/executor.py DiffusionExecutor:89/process_request:313).

TPU design: the ENTIRE denoise loop (N sampler steps, optional
classifier-free guidance) is one jitted ``lax.scan`` — the analog of
the reference capturing denoise steps in CUDA graphs, taken further:
zero host round-trips between steps. The executor batches queued
requests of the same shape into one scan dispatch.

Samplers: rectified-flow Euler (the WAN/flow-matching family) and DDIM
(eps-prediction family) over a configurable sigma schedule.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..logger import logger
from .dit import DiTConfig, DiTDenoiser


@dataclasses.dataclass
class VisualGenParams:
    """Reference: visual_gen/params.py VisualGenParams."""
    num_inference_steps: int = 20
    guidance_scale: float = 1.0
    seed: int = 0
    sampler: str = "euler"           # euler (flow) | ddim


@dataclasses.dataclass
class DiffusionRequest:
    request_id: int
    params: VisualGenParams
    cond: Optional[np.ndarray] = None      # [cond_dim] embedding


@dataclasses.dataclass
class DiffusionResponse:
    request_id: int
    latent: Optional[np.ndarray] = None    # [H, W, C]
    error: Optional[str] = None


def flow_sigmas(steps: int) -> np.ndarray:
    """Rectified-flow time grid t: 1 -> 0 (noise -> data)."""
    return np.linspace(1.0, 0.0, steps + 1, dtype=np.float32)


def ddim_alphas(steps: int, total_t: int = 1000) -> np.ndarray:
    """Cosine alpha-bar schedule on the DDIM step grid, ordered
    noise -> data (abar[0] ~ 0 at t=T-1, abar[-1] = 1 at t=0); the
    noisy end is floored at 1e-4 so x0-prediction stays finite."""
    ts = np.linspace(total_t - 1, 0, steps + 1)
    f = np.cos((ts / total_t + 0.008) / 1.008 * np.pi / 2) ** 2
    f0 = np.cos(0.008 / 1.008 * np.pi / 2) ** 2
    return np.clip(f / f0, 1e-4, 1.0).astype(np.float32)


class DiffusionPipeline:
    """One denoiser + jitted whole-loop samplers."""

    def __init__(self, config: DiTConfig, params=None, key=None):
        self.cfg = config
        self.model = DiTDenoiser(config)
        self.params = params if params is not None else \
            self.model.init_params(key or jax.random.PRNGKey(0))
        self._fns: Dict[Any, Any] = {}

    def _loop_fn(self, steps: int, sampler: str, guided: bool):
        model, cfg = self.model, self.cfg

        if sampler == "euler":
            tgrid = jnp.asarray(flow_sigmas(steps))
        else:
            abar = jnp.asarray(ddim_alphas(steps))
            tgrid = jnp.linspace(999.0, 0.0, steps + 1)

        def denoise(params, x, t, cond, gscale):
            if not guided:
                return model(params, x, t, cond)
            # classifier-free guidance: cond + uncond in one batch
            x2 = jnp.concatenate([x, x], 0)
            t2 = jnp.concatenate([t, t], 0)
            c2 = jnp.concatenate([cond, jnp.zeros_like(cond)], 0)
            v = model(params, x2, t2, c2)
            vc, vu = jnp.split(v, 2, 0)
            return vu + gscale * (vc - vu)

        def loop(params, noise, cond, gscale):
            B = noise.shape[0]

            def euler_step(x, i):
                t0, t1 = tgrid[i], tgrid[i + 1]
                tb = jnp.full((B,), t0 * 1000.0)
                v = denoise(params, x, tb, cond, gscale)
                return x + (t1 - t0) * v, None

            def ddim_step(x, i):
                a0, a1 = abar[i], abar[i + 1]
                tb = jnp.full((B,), tgrid[i])
                eps = denoise(params, x, tb, cond, gscale)
                x0 = (x - jnp.sqrt(1 - a0) * eps) / jnp.sqrt(a0)
                return jnp.sqrt(a1) * x0 + jnp.sqrt(1 - a1) * eps, None

            step = euler_step if sampler == "euler" else ddim_step
            x, _ = jax.lax.scan(step, noise,
                                jnp.arange(steps, dtype=jnp.int32))
            return x

        return jax.jit(loop)

    def generate(self, batch: int, p: VisualGenParams,
                 cond: Optional[np.ndarray] = None) -> np.ndarray:
        cfg = self.cfg
        key = jax.random.PRNGKey(p.seed)
        noise = jax.random.normal(
            key, (batch, cfg.latent_size, cfg.latent_size,
                  cfg.latent_channels), jnp.float32)
        guided = p.guidance_scale != 1.0 and cond is not None
        fkey = (p.num_inference_steps, p.sampler, guided)
        if fkey not in self._fns:
            self._fns[fkey] = self._loop_fn(*fkey)
        c = jnp.zeros((batch, cfg.cond_dim), jnp.float32) if cond is None \
            else jnp.asarray(cond, jnp.float32).reshape(batch, -1)
        out = self._fns[fkey](self.params, noise, c,
                              jnp.float32(p.guidance_scale))
        return np.asarray(out)


class DiffusionExecutor:
    """Batching executor (reference: executor.py DiffusionExecutor):
    queued requests with identical (steps, sampler, guidance) coalesce
    into one scan dispatch."""

    def __init__(self, pipeline: DiffusionPipeline,
                 max_batch_size: int = 8):
        self.pipeline = pipeline
        self.max_batch_size = max_batch_size
        self._q: "queue.Queue[DiffusionRequest]" = queue.Queue()
        self._results: Dict[int, "queue.Queue"] = {}
        self._shutdown = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tllm-tpu-diffusion")
        self._thread.start()

    def submit(self, req: DiffusionRequest) -> "queue.Queue":
        ch: "queue.Queue" = queue.Queue()
        self._results[req.request_id] = ch
        self._q.put(req)
        return ch

    def _loop(self):
        while not self._shutdown.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            key0 = (first.params.num_inference_steps,
                    first.params.sampler, first.params.guidance_scale,
                    first.params.seed)
            while len(batch) < self.max_batch_size:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                k = (nxt.params.num_inference_steps, nxt.params.sampler,
                     nxt.params.guidance_scale, nxt.params.seed)
                if k != key0:
                    self._q.put(nxt)
                    break
                batch.append(nxt)
            try:
                cond = None
                if any(r.cond is not None for r in batch):
                    cond = np.stack([
                        r.cond if r.cond is not None
                        else np.zeros(self.pipeline.cfg.cond_dim,
                                      np.float32) for r in batch])
                lat = self.pipeline.generate(len(batch), first.params,
                                             cond)
                for i, r in enumerate(batch):
                    self._results.pop(r.request_id).put(
                        DiffusionResponse(r.request_id, latent=lat[i]))
            except Exception as e:      # pragma: no cover
                logger.error("diffusion batch failed: %s", e)
                for r in batch:
                    self._results.pop(r.request_id).put(
                        DiffusionResponse(r.request_id, error=str(e)))

    def shutdown(self):
        self._shutdown.set()
        self._thread.join(timeout=10)


class VisualGen:
    """User facade (reference: visual_gen.py VisualGen)."""

    def __init__(self, model: Optional[DiTConfig] = None,
                 max_batch_size: int = 8, params=None):
        cfg = model or DiTConfig()
        self.pipeline = DiffusionPipeline(cfg, params=params)
        self.executor = DiffusionExecutor(self.pipeline, max_batch_size)
        self._next_id = 0

    def generate(self, params: Optional[VisualGenParams] = None,
                 cond: Optional[np.ndarray] = None,
                 timeout: float = 600.0) -> DiffusionResponse:
        p = params or VisualGenParams()
        self._next_id += 1
        ch = self.executor.submit(
            DiffusionRequest(self._next_id, p, cond))
        return ch.get(timeout=timeout)

    def shutdown(self):
        self.executor.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.shutdown()
