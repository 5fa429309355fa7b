from .mode import KvCacheQuantAlgo, QuantAlgo, QuantMode  # noqa: F401
