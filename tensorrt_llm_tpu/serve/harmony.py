"""Harmony format adapter for GPT-OSS serving.

Role of the reference ``serve/harmony_adapter.py`` (reference:
harmony_adapter.py:1 — renders chat/responses requests into OpenAI's
harmony conversation format and parses the model's channeled output
back into reasoning / content / tool calls; the reference delegates to
the ``openai_harmony`` tokenizer library). This adapter implements the
published format at the TEXT level, tokenizer-agnostic:

  prompt:   <|start|>system<|message|>...<|end|>
            <|start|>developer<|message|># Instructions ... # Tools ...<|end|>
            <|start|>user<|message|>...<|end|>
            <|start|>assistant
  output:   <|channel|>analysis<|message|>{reasoning}<|end|>
            <|start|>assistant<|channel|>commentary to=functions.NAME
                <|constrain|>json<|message|>{args}<|call|>
            <|start|>assistant<|channel|>final<|message|>{answer}<|return|>

Generation stops at <|return|> (final answer done) or <|call|> (tool
call emitted) — the server maps both onto stop strings.
"""
from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional

START = "<|start|>"
END = "<|end|>"
MESSAGE = "<|message|>"
CHANNEL = "<|channel|>"
RETURN = "<|return|>"
CALL = "<|call|>"
CONSTRAIN = "<|constrain|>"

STOP_STRINGS = [RETURN, CALL]


def render_system(model_identity: Optional[str] = None,
                  reasoning_effort: str = "medium",
                  knowledge_cutoff: str = "2024-06") -> str:
    ident = model_identity or \
        "You are ChatGPT, a large language model trained by OpenAI."
    body = (f"{ident}\nKnowledge cutoff: {knowledge_cutoff}\n\n"
            f"Reasoning: {reasoning_effort}\n\n"
            "# Valid channels: analysis, commentary, final. "
            "Channel must be included for every message.")
    return f"{START}system{MESSAGE}{body}{END}"


def render_developer(instructions: Optional[str],
                     tools: Optional[List[dict]]) -> Optional[str]:
    parts = []
    if instructions:
        parts.append(f"# Instructions\n\n{instructions}")
    if tools:
        lines = ["# Tools", "", "## functions", "",
                 "namespace functions {", ""]
        for t in tools:
            fn = t.get("function", t)
            desc = fn.get("description", "")
            if desc:
                lines.append(f"// {desc}")
            params = fn.get("parameters")
            if params:
                lines.append(f"type {fn['name']} = "
                             f"(_: {json.dumps(params)}) => any;")
            else:
                lines.append(f"type {fn['name']} = () => any;")
            lines.append("")
        lines.append("} // namespace functions")
        parts.append("\n".join(lines))
    if not parts:
        return None
    return f"{START}developer{MESSAGE}" + "\n\n".join(parts) + END


def render_prompt(messages: List[Dict[str, Any]],
                  tools: Optional[List[dict]] = None,
                  reasoning_effort: str = "medium",
                  model_identity: Optional[str] = None) -> str:
    """Chat messages -> harmony prompt text ending at the assistant
    header (the model continues with `<|channel|>...`)."""
    out = [render_system(model_identity, reasoning_effort)]
    sys_instr = None
    body: List[str] = []
    for m in messages:
        role = m.get("role")
        content = m.get("content") or ""
        if role == "system":
            sys_instr = (sys_instr + "\n\n" + content) if sys_instr \
                else content
            continue
        if role == "developer":
            sys_instr = (sys_instr + "\n\n" + content) if sys_instr \
                else content
            continue
        if role == "assistant":
            if m.get("tool_calls"):
                for tc in m["tool_calls"]:
                    fn = tc.get("function", tc)
                    body.append(
                        f"{START}assistant{CHANNEL}commentary "
                        f"to=functions.{fn['name']} {CONSTRAIN}json"
                        f"{MESSAGE}{fn.get('arguments', '{}')}{CALL}")
            if content:
                body.append(f"{START}assistant{CHANNEL}final"
                            f"{MESSAGE}{content}{END}")
            continue
        if role == "tool":
            name = m.get("name", "tool")
            body.append(f"{START}functions.{name} to=assistant"
                        f"{CHANNEL}commentary{MESSAGE}{content}{END}")
            continue
        body.append(f"{START}{role}{MESSAGE}{content}{END}")
    dev = render_developer(sys_instr, tools)
    if dev:
        out.append(dev)
    out.extend(body)
    out.append(f"{START}assistant")
    return "".join(out)


_SEG_RE = re.compile(
    re.escape(CHANNEL) + r"(?P<hdr>.*?)" + re.escape(MESSAGE) +
    r"(?P<body>.*?)(?:" + re.escape(END) + "|" + re.escape(RETURN) + "|" +
    re.escape(CALL) + "|$)", re.DOTALL)
_TO_RE = re.compile(r"to=functions\.([A-Za-z0-9_\-]+)")


def parse_output(text: str) -> Dict[str, Any]:
    """Channeled completion text -> {"reasoning", "content",
    "tool_calls": [{"name", "arguments"}]}. Content before any channel
    marker is treated as final (models sometimes skip the header when
    the prompt ends mid-message)."""
    reasoning, finals, tool_calls = [], [], []
    first = text.find(CHANNEL)
    if first < 0:
        plain = _strip_specials(text)
        return {"reasoning": None, "content": plain, "tool_calls": []}
    for m in _SEG_RE.finditer(text):
        hdr = m.group("hdr").strip()
        body = m.group("body")
        tool = _TO_RE.search(hdr)
        if tool:
            tool_calls.append({"name": tool.group(1),
                               "arguments": body.strip()})
        elif hdr.startswith("analysis"):
            reasoning.append(body)
        elif hdr.startswith("final"):
            finals.append(body)
        elif hdr.startswith("commentary"):
            # user-visible commentary without a tool target: preamble
            finals.append(body)
    return {"reasoning": "".join(reasoning) or None,
            "content": "".join(finals),
            "tool_calls": tool_calls}


def _strip_specials(text: str) -> str:
    for tok in (START + "assistant", START, END, RETURN, CALL, MESSAGE):
        text = text.replace(tok, "")
    return text


_SPECIALS = (START, END, MESSAGE, CHANNEL, RETURN, CALL, CONSTRAIN)


def _safe_emit_len(buf: str) -> int:
    """Length of the prefix safe to emit: hold back the longest suffix
    that is a proper prefix of any special token (it may complete with
    the next delta)."""
    max_hold = max(len(t) for t in _SPECIALS) - 1
    for hold in range(min(max_hold, len(buf)), 0, -1):
        suf = buf[len(buf) - hold:]
        if any(t.startswith(suf) for t in _SPECIALS):
            return len(buf) - hold
    return len(buf)


class HarmonyStreamParser:
    """Incremental channel parser for SSE streaming: feed decoded text
    deltas, receive typed events (the reference's HarmonyStreamState
    role, harmony_adapter.py:47)."""

    def __init__(self):
        self._buf = ""
        self._channel: Optional[str] = None   # None | analysis | final
        self._tool: Optional[str] = None
        self._tool_args = ""

    def feed(self, delta: str) -> List[Dict[str, Any]]:
        self._buf += delta
        events: List[Dict[str, Any]] = []
        while True:
            if self._channel is None:
                i = self._buf.find(MESSAGE)
                if i < 0:
                    # keep a partial special-token tail buffered
                    return events
                hdr = self._buf[:i]
                self._buf = self._buf[i + len(MESSAGE):]
                tool = _TO_RE.search(hdr)
                if tool:
                    self._channel = "tool"
                    self._tool = tool.group(1)
                    self._tool_args = ""
                elif "analysis" in hdr:
                    self._channel = "analysis"
                else:
                    self._channel = "final"
                continue
            # inside a message: emit up to the next terminator
            ends = [(self._buf.find(t), t)
                    for t in (END, RETURN, CALL, CHANNEL)]
            ends = [(i, t) for i, t in ends if i >= 0]
            if not ends:
                # emit all but a suffix that could begin a special token
                safe = _safe_emit_len(self._buf)
                if safe > 0:
                    events.extend(self._emit(self._buf[:safe]))
                    self._buf = self._buf[safe:]
                return events
            i, tok = min(ends)
            if i > 0:
                events.extend(self._emit(self._buf[:i]))
            if self._channel == "tool":
                events.append({"type": "tool_call", "name": self._tool,
                               "arguments": self._tool_args})
            if tok == CHANNEL:
                # a new header starts right here: leave the channel
                # token in the buffer — the header scan takes everything
                # before the next <|message|> (including any glued
                # <|start|>assistant) as the header text
                self._buf = self._buf[i:]
            else:
                self._buf = self._buf[i + len(tok):]
            self._channel = None
            self._tool = None

    def _emit(self, text: str) -> List[Dict[str, Any]]:
        if not text:
            return []
        if self._channel == "analysis":
            return [{"type": "reasoning", "delta": text}]
        if self._channel == "tool":
            self._tool_args += text
            return []
        return [{"type": "content", "delta": text}]
