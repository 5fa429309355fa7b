"""Incremental detokenization for streaming.

Role of the reference's streaming postprocess path (reference:
tensorrt_llm/executor/result.py detokenization + postprocess workers).
Handles the classic streaming pitfalls: multi-token unicode sequences
(hold back until the replacement char resolves) and tokenizers whose
decode depends on preceding context (decode with a sliding prefix).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

_REPLACEMENT = "�"


class IncrementalDetokenizer:
    def __init__(self, tokenizer, skip_special_tokens: bool = True,
                 context_window: int = 8):
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self.context_window = context_window
        self._tokens: List[int] = []
        self._emitted_text_len = 0

    def put(self, token_ids: List[int]) -> str:
        """Add tokens; returns newly-decodable text (may be empty while a
        multi-byte sequence is incomplete)."""
        self._tokens.extend(token_ids)
        text = self._decode(self._tokens)
        if text.endswith(_REPLACEMENT):
            # incomplete UTF-8 sequence: hold back
            return ""
        new = text[self._emitted_text_len:]
        self._emitted_text_len = len(text)
        return new

    def finish(self) -> str:
        text = self._decode(self._tokens)
        new = text[self._emitted_text_len:]
        self._emitted_text_len = len(text)
        return new

    @property
    def full_text(self) -> str:
        return self._decode(self._tokens)

    def _decode(self, ids: List[int]) -> str:
        if self.tokenizer is None:
            return ""
        try:
            return self.tokenizer.decode(
                ids, skip_special_tokens=self.skip_special_tokens)
        except Exception:
            return ""
