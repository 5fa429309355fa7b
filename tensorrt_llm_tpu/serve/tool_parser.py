"""Tool-call parsers: extract function calls from generated text.

Behavioral reference: tensorrt_llm/serve/tool_parser/ (BaseToolParser
:16, the per-model parsers, tool_parser_factory.py). Each parser turns
a model's tool-call markup into OpenAI ``tool_calls`` entries and
strips it from the visible content; the streaming variant consumes
incremental text and emits calls as their closing markers arrive.

Formats carried here:
  * hermes  — ``<tool_call>{"name": ..., "arguments": {...}}</tool_call>``
    (Qwen/Hermes-style; reference qwen3_tool_parser.py)
  * llama3_json — bare JSON object(s) ``{"name": ..., "parameters": ...}``
    as the whole response (reference llama 3.1 json tool format)
  * mistral — ``[TOOL_CALLS] [{...}, ...]``
"""
from __future__ import annotations

import dataclasses
import json
import re
import uuid
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional, Tuple


@dataclasses.dataclass
class ToolCall:
    name: str
    arguments: str            # JSON string (OpenAI wire format)
    id: str = dataclasses.field(
        default_factory=lambda: "call_" + uuid.uuid4().hex[:24])

    def to_openai(self) -> Dict[str, Any]:
        return {"id": self.id, "type": "function",
                "function": {"name": self.name,
                             "arguments": self.arguments}}


@dataclasses.dataclass
class ParseResult:
    content: str                       # visible text with markup removed
    tool_calls: List[ToolCall]


class BaseToolParser(ABC):
    @abstractmethod
    def parse(self, text: str) -> ParseResult: ...

    def parse_streaming_increment(self, new_text: str) -> ParseResult:
        """Default streaming: buffer until a complete call can be cut.
        Emits visible text eagerly while holding back partial markup."""
        self._buf = getattr(self, "_buf", "") + new_text
        res = self.parse(self._buf)
        if res.tool_calls:
            self._buf = ""
            return res
        # hold back anything that could be the start of markup
        safe, hold = self._split_safe(self._buf)
        self._buf = hold
        return ParseResult(content=safe, tool_calls=[])

    def _split_safe(self, text: str) -> Tuple[str, str]:
        return text, ""


def _fix_args(args: Any) -> str:
    if isinstance(args, str):
        return args
    return json.dumps(args if args is not None else {})


class HermesToolParser(BaseToolParser):
    """<tool_call>{...}</tool_call> blocks."""
    _RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.DOTALL)
    _OPEN = "<tool_call>"

    def parse(self, text: str) -> ParseResult:
        calls = []
        for m in self._RE.finditer(text):
            try:
                obj = json.loads(m.group(1))
                calls.append(ToolCall(
                    name=obj.get("name", ""),
                    arguments=_fix_args(obj.get("arguments",
                                                obj.get("parameters")))))
            except json.JSONDecodeError:
                continue
        content = self._RE.sub("", text).strip()
        return ParseResult(content=content, tool_calls=calls)

    def _split_safe(self, text: str) -> Tuple[str, str]:
        idx = text.find(self._OPEN)
        if idx >= 0:
            return text[:idx], text[idx:]
        # partial opening tag at the tail?
        for n in range(len(self._OPEN) - 1, 0, -1):
            if text.endswith(self._OPEN[:n]):
                return text[:-n], text[-n:]
        return text, ""


class Llama3JsonToolParser(BaseToolParser):
    """Whole-response JSON: {"name": ..., "parameters": {...}}
    (optionally ';'-separated for parallel calls)."""

    def parse(self, text: str) -> ParseResult:
        stripped = text.strip()
        calls = []
        for part in stripped.split(";"):
            part = part.strip()
            if not (part.startswith("{") and part.endswith("}")):
                return ParseResult(content=text, tool_calls=[])
            try:
                obj = json.loads(part)
            except json.JSONDecodeError:
                return ParseResult(content=text, tool_calls=[])
            if "name" not in obj:
                return ParseResult(content=text, tool_calls=[])
            calls.append(ToolCall(
                name=obj["name"],
                arguments=_fix_args(obj.get("parameters",
                                            obj.get("arguments")))))
        return ParseResult(content="", tool_calls=calls)


class MistralToolParser(BaseToolParser):
    """[TOOL_CALLS] [{...}, ...]"""
    _MARK = "[TOOL_CALLS]"

    def parse(self, text: str) -> ParseResult:
        idx = text.find(self._MARK)
        if idx < 0:
            return ParseResult(content=text, tool_calls=[])
        payload = text[idx + len(self._MARK):].strip()
        try:
            arr = json.loads(payload)
        except json.JSONDecodeError:
            return ParseResult(content=text, tool_calls=[])
        if isinstance(arr, dict):
            arr = [arr]
        calls = [ToolCall(name=o.get("name", ""),
                          arguments=_fix_args(o.get("arguments",
                                                    o.get("parameters"))))
                 for o in arr]
        return ParseResult(content=text[:idx].strip(), tool_calls=calls)

    def _split_safe(self, text: str) -> Tuple[str, str]:
        idx = text.find(self._MARK)
        if idx >= 0:
            return text[:idx], text[idx:]
        for n in range(len(self._MARK) - 1, 0, -1):
            if text.endswith(self._MARK[:n]):
                return text[:-n], text[-n:]
        return text, ""


_PARSERS = {
    "hermes": HermesToolParser,
    "qwen": HermesToolParser,
    "llama3_json": Llama3JsonToolParser,
    "mistral": MistralToolParser,
}


def create_tool_parser(name: str) -> BaseToolParser:
    """Factory (reference: tool_parser_factory.py)."""
    if name not in _PARSERS:
        raise ValueError(f"unknown tool parser {name!r}; "
                         f"available: {sorted(_PARSERS)}")
    return _PARSERS[name]()
