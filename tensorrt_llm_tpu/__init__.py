"""tensorrt_llm_tpu — a TPU-native LLM inference engine.

Brand-new JAX/XLA/Pallas implementation with the capability envelope of
TensorRT-LLM (reference mounted read-only at /root/reference; see
SURVEY.md for the structural map). Public API mirrors the reference's
``LLM`` / ``SamplingParams`` surface.
"""
from .llmapi.llm import LLM, RequestOutput
from .llmapi.llm_args import (BucketingConfig, KvCacheConfig, LlmArgs,
                              QuantConfig, SchedulerConfig)
from .mapping import Mapping
from .quantization.mode import KvCacheQuantAlgo, QuantAlgo, QuantMode
from .sampling_params import GuidedDecodingParams, SamplingParams
from .version import __version__

__all__ = [
    "LLM", "RequestOutput", "LlmArgs", "KvCacheConfig", "SchedulerConfig",
    "BucketingConfig", "QuantConfig", "Mapping", "QuantAlgo", "QuantMode",
    "KvCacheQuantAlgo", "SamplingParams", "GuidedDecodingParams",
    "__version__",
]
