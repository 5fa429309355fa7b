"""Opt-out usage telemetry (reference: tensorrt_llm/usage/)."""
from .schema import USAGE_EVENT_SCHEMA, UsageEvent, validate_event
from .usage_lib import UsageReporter, collect_features, is_usage_stats_enabled

__all__ = ["UsageReporter", "UsageEvent", "USAGE_EVENT_SCHEMA",
           "validate_event", "collect_features", "is_usage_stats_enabled"]
