"""Tool parsers + /v1/responses endpoint (reference:
serve/tool_parser/, openai_server responses route)."""
import json

import pytest

from tensorrt_llm_tpu.serve.tool_parser import (HermesToolParser,
                                                Llama3JsonToolParser,
                                                MistralToolParser,
                                                create_tool_parser)


def test_hermes_parser_extracts_calls():
    p = HermesToolParser()
    text = ('Sure, checking.\n<tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "Oslo"}}\n'
            '</tool_call> done')
    r = p.parse(text)
    assert len(r.tool_calls) == 1
    c = r.tool_calls[0]
    assert c.name == "get_weather"
    assert json.loads(c.arguments) == {"city": "Oslo"}
    assert "tool_call" not in r.content
    assert "Sure" in r.content


def test_hermes_streaming_holds_partial_markup():
    p = HermesToolParser()
    r1 = p.parse_streaming_increment("hello <tool")
    assert r1.content == "hello " and not r1.tool_calls
    r2 = p.parse_streaming_increment(
        '_call>{"name": "f", "arguments": {}}</tool_call>')
    assert len(r2.tool_calls) == 1 and r2.tool_calls[0].name == "f"


def test_llama3_json_parser():
    p = Llama3JsonToolParser()
    r = p.parse('{"name": "add", "parameters": {"a": 1, "b": 2}}')
    assert len(r.tool_calls) == 1
    assert json.loads(r.tool_calls[0].arguments) == {"a": 1, "b": 2}
    # non-tool text passes through
    r2 = p.parse("just a normal answer")
    assert not r2.tool_calls and r2.content == "just a normal answer"


def test_mistral_parser():
    p = MistralToolParser()
    r = p.parse('ok [TOOL_CALLS] [{"name": "f", "arguments": {"x": 1}}]')
    assert len(r.tool_calls) == 1 and r.content == "ok"


def test_factory_rejects_unknown():
    create_tool_parser("hermes")
    with pytest.raises(ValueError):
        create_tool_parser("nope")
