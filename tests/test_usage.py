"""Usage telemetry: schema validation, opt-out, fail-silent reporter
(reference: tensorrt_llm/usage/ + its schema json)."""
import os

import pytest


def test_schema_validates_wellformed_event():
    from tensorrt_llm_tpu.usage import UsageEvent, validate_event
    ev = UsageEvent(event_type="llm_init", session_id="abc",
                    version="1.0", architecture="LlamaForCausalLM",
                    features="lora,quant:INT4_AWQ")
    validate_event(ev.to_payload())


def test_schema_rejects_unknown_and_missing_fields():
    from tensorrt_llm_tpu.usage import UsageEvent, validate_event
    ev = UsageEvent(event_type="llm_init", session_id="abc", version="1")
    p = ev.to_payload()
    p["prompt"] = "leak"            # closed key set: no payload smuggling
    with pytest.raises(ValueError):
        validate_event(p)
    p2 = ev.to_payload()
    del p2["session_id"]
    with pytest.raises(ValueError):
        validate_event(p2)
    p3 = ev.to_payload()
    p3["event_type"] = "exfiltrate"
    with pytest.raises(ValueError):
        validate_event(p3)


def test_opt_out_envs(monkeypatch):
    from tensorrt_llm_tpu.usage import is_usage_stats_enabled
    # pytest sets PYTEST_CURRENT_TEST → CI detection already disables
    assert not is_usage_stats_enabled()
    monkeypatch.delenv("PYTEST_CURRENT_TEST", raising=False)
    for e in ("CI", "GITHUB_ACTIONS", "GITLAB_CI", "JENKINS_URL"):
        monkeypatch.delenv(e, raising=False)
    assert is_usage_stats_enabled()
    monkeypatch.setenv("TLLM_TPU_USAGE_STATS", "0")
    assert not is_usage_stats_enabled()
    monkeypatch.delenv("TLLM_TPU_USAGE_STATS")
    monkeypatch.setenv("DO_NOT_TRACK", "1")
    assert not is_usage_stats_enabled()


def test_reporter_records_and_never_raises(monkeypatch):
    from tensorrt_llm_tpu.usage import UsageReporter
    monkeypatch.delenv("PYTEST_CURRENT_TEST", raising=False)
    for e in ("CI", "GITHUB_ACTIONS", "GITLAB_CI", "JENKINS_URL"):
        monkeypatch.delenv(e, raising=False)
    # unreachable server: emit must swallow the failure
    rep = UsageReporter(server="http://127.0.0.1:1/nope",
                        heartbeat_interval=3600)
    rep.start(llm=None)
    rep.shutdown()
    kinds = [p["event_type"] for p in rep.recorded]
    assert kinds == ["llm_init", "llm_shutdown"]


def test_feature_collection():
    from tensorrt_llm_tpu.llmapi.llm_args import LlmArgs, SpeculativeConfig
    from tensorrt_llm_tpu.usage import collect_features
    args = LlmArgs(model="x", enable_lora=True,
                   speculative_config=SpeculativeConfig(
                       mode="NGRAM", max_draft_len=4))
    feats = collect_features(args)
    assert "lora" in feats and "spec:NGRAM" in feats
    assert "overlap" in feats
