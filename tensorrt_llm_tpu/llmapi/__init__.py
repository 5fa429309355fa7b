from .llm import LLM, RequestOutput  # noqa: F401
from .llm_args import (BucketingConfig, KvCacheConfig, LlmArgs,  # noqa: F401
                       QuantConfig, SchedulerConfig)
