"""Per-request OTLP tracing (llmapi/tracing.py; reference:
llmapi/tracing.py:64 traceparent propagation HTTP -> executor)."""
import http.server
import json
import threading

import pytest

from tensorrt_llm_tpu.llmapi.tracing import (OtlpJsonExporter,
                                             RequestTracer,
                                             extract_trace_context,
                                             format_traceparent,
                                             parse_traceparent)


def test_traceparent_parse_roundtrip():
    tid = "0af7651916cd43dd8448eb211c80319c"
    sid = "b7ad6b7169203331"
    hdr = format_traceparent(tid, sid, 1)
    assert parse_traceparent(hdr) == (tid, sid, 1)
    assert parse_traceparent("garbage") is None
    assert parse_traceparent("00-" + "0" * 32 + "-" + sid + "-01") is None
    assert extract_trace_context({"traceparent": hdr}) == (tid, sid, 1)
    assert extract_trace_context({}) is None


class _Collector(http.server.BaseHTTPRequestHandler):
    received = []

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        _Collector.received.append(json.loads(self.rfile.read(n)))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):
        pass


@pytest.fixture()
def collector():
    _Collector.received = []
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_e2e_request_span_export(collector, monkeypatch):
    """A traced request through the real LLM path lands one llm_request
    span (with gen_ai attributes + lifecycle events) at the collector."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    monkeypatch.setenv("OTEL_EXPORTER_OTLP_TRACES_ENDPOINT", collector)
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=128)
    llm = LLM(model=LlamaForCausalLM(cfg).eval(), skip_tokenizer_init=True,
              dtype="float32", max_batch_size=2, max_input_len=16,
              max_seq_len=64, max_num_tokens=64,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=256))
    tid = "0af7651916cd43dd8448eb211c80319c"
    hdr = {"traceparent": format_traceparent(tid, "b7ad6b7169203331")}
    out = llm.generate_async(
        [1, 2, 3], SamplingParams(max_tokens=4, top_k=1),
        trace_headers=hdr).result(timeout=300)
    assert len(out.outputs[0].token_ids) == 4
    # untraced request: no span
    llm.generate([4, 5], SamplingParams(max_tokens=2, top_k=1))
    llm.executor.tracer.exporter.flush()
    llm.shutdown()

    spans = []
    for payload in _Collector.received:
        for rs in payload["resourceSpans"]:
            for ss in rs["scopeSpans"]:
                spans.extend(ss["spans"])
    assert len(spans) == 1, spans
    sp = spans[0]
    assert sp["traceId"] == tid
    assert sp["parentSpanId"] == "b7ad6b7169203331"
    assert sp["name"] == "llm_request"
    attrs = {a["key"]: a["value"] for a in sp["attributes"]}
    assert attrs["gen_ai.usage.prompt_tokens"]["intValue"] == "3"
    assert attrs["gen_ai.usage.completion_tokens"]["intValue"] == "4"
    names = [e["name"] for e in sp["events"]]
    assert names == ["queued", "scheduled", "first_token", "finished"]
    assert int(sp["endTimeUnixNano"]) >= int(sp["startTimeUnixNano"])


def test_exporter_survives_dead_collector():
    exp = OtlpJsonExporter("http://127.0.0.1:1")  # nothing listens
    exp.export({"traceId": "x", "spanId": "y", "name": "n"})
    exp.flush()   # must not raise
    exp.shutdown()
