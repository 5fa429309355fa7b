"""Harmony format adapter (serve/harmony.py; reference:
serve/harmony_adapter.py for GPT-OSS channeled prompts/outputs)."""
from tensorrt_llm_tpu.serve.harmony import (HarmonyStreamParser,
                                            STOP_STRINGS, parse_output,
                                            render_prompt)


def test_render_prompt_structure():
    text = render_prompt(
        [{"role": "system", "content": "Be terse."},
         {"role": "user", "content": "hi"},
         {"role": "assistant", "content": "hello"},
         {"role": "user", "content": "2+2?"}],
        tools=[{"type": "function",
                "function": {"name": "add", "description": "adds",
                             "parameters": {"type": "object"}}}],
        reasoning_effort="high")
    assert text.startswith("<|start|>system<|message|>")
    assert "Reasoning: high" in text
    assert "# Instructions\n\nBe terse." in text
    assert "namespace functions" in text and "type add =" in text
    assert "<|start|>user<|message|>hi<|end|>" in text
    assert "<|start|>assistant<|channel|>final<|message|>hello<|end|>" \
        in text
    assert text.endswith("<|start|>assistant")


def test_render_tool_history():
    text = render_prompt(
        [{"role": "user", "content": "weather?"},
         {"role": "assistant", "tool_calls": [
             {"function": {"name": "get_weather",
                           "arguments": '{"city": "SF"}'}}]},
         {"role": "tool", "name": "get_weather", "content": '{"t": 20}'}])
    assert "to=functions.get_weather" in text
    assert '<|message|>{"city": "SF"}<|call|>' in text
    assert "<|start|>functions.get_weather to=assistant" in text


def test_parse_output_channels():
    out = parse_output(
        "<|channel|>analysis<|message|>think think<|end|>"
        "<|start|>assistant<|channel|>final<|message|>4<|return|>")
    assert out["reasoning"] == "think think"
    assert out["content"] == "4"
    assert out["tool_calls"] == []


def test_parse_output_tool_call():
    out = parse_output(
        "<|channel|>analysis<|message|>need the api<|end|>"
        "<|start|>assistant<|channel|>commentary to=functions.get_weather"
        " <|constrain|>json<|message|>{\"city\": \"SF\"}<|call|>")
    assert out["tool_calls"] == [
        {"name": "get_weather", "arguments": '{"city": "SF"}'}]
    assert out["reasoning"] == "need the api"
    assert out["content"] == ""


def test_parse_output_plain_text():
    out = parse_output("just an answer")
    assert out["content"] == "just an answer"
    assert out["reasoning"] is None


def test_stream_parser_incremental():
    text = ("<|channel|>analysis<|message|>aa bb<|end|>"
            "<|start|>assistant<|channel|>final<|message|>cc dd<|return|>")
    for chunk_size in (1, 3, 7, len(text)):
        p = HarmonyStreamParser()
        events = []
        for i in range(0, len(text), chunk_size):
            events.extend(p.feed(text[i:i + chunk_size]))
        reasoning = "".join(e["delta"] for e in events
                            if e["type"] == "reasoning")
        content = "".join(e["delta"] for e in events
                          if e["type"] == "content")
        assert reasoning == "aa bb", (chunk_size, events)
        assert content == "cc dd", (chunk_size, events)


def test_stream_parser_tool_event():
    p = HarmonyStreamParser()
    events = p.feed("<|channel|>commentary to=functions.add "
                    "<|constrain|>json<|message|>{\"a\": 1}<|call|>")
    assert {"type": "tool_call", "name": "add",
            "arguments": '{"a": 1}'} in events


def test_stop_strings():
    assert "<|return|>" in STOP_STRINGS and "<|call|>" in STOP_STRINGS
