"""Visual generation (diffusion) — TPU-native minimal slice.

Role analog of the reference's visual_gen stack (reference:
tensorrt_llm/visual_gen/visual_gen.py VisualGen facade +
_torch/visual_gen/executor.py DiffusionExecutor — WAN/LTX2/Cosmos
pipelines, ~28k LoC). TPU scope: ONE generic DiT (diffusion
transformer) denoiser with adaLN timestep conditioning, a
flow-matching/DDIM sampler whose whole denoise loop runs inside a
single jitted lax.scan (the XLA analog of the reference's CUDA-graphed
denoise steps), and a batching executor with the same request/response
shape. Checkpoint families (WAN etc.) are a documented scope cut —
the pipeline registry accepts new model classes.
"""
from .pipeline import (DiffusionExecutor, DiffusionRequest,
                       DiffusionResponse, VisualGen, VisualGenParams)
from .dit import DiTConfig, DiTDenoiser

__all__ = ["VisualGen", "VisualGenParams", "DiffusionExecutor",
           "DiffusionRequest", "DiffusionResponse", "DiTConfig",
           "DiTDenoiser"]
