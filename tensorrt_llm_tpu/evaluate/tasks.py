"""Task evaluators over the LLM API.

Role of the reference's lm-eval integration and accuracy suite
(reference: tensorrt_llm/evaluate/lm_eval.py:1, evaluate/interface.py
Evaluator, tests/integration/defs/accuracy/accuracy_core.py — tasks are
classes with an ``evaluate(llm)`` returning a score that is gated by the
hypothesis test against per-model reference values).

No dataset downloads happen here (no egress): tasks read local JSONL
files in the common public schema, so a mounted copy of the official
datasets evaluates directly. Each task also carries a tiny built-in
sample so the harness itself stays testable offline.
"""
from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

from .accuracy_core import hypothesis_test_pass

TASK_REGISTRY: Dict[str, type] = {}


def register_task(name: str):
    def deco(cls):
        cls.name = name
        TASK_REGISTRY[name] = cls
        return cls
    return deco


# reference accuracy values per (task, model family) — the role of
# tests/integration/defs/accuracy/references/*.yaml
REFERENCE_ACCURACY: Dict[str, Dict[str, float]] = {
    "gsm8k": {
        "meta-llama/Llama-3.1-8B-Instruct": 74.20,
        "meta-llama/Llama-3.2-1B": 6.30,
        "Qwen/Qwen2.5-7B-Instruct": 81.00,
        "mistralai/Mixtral-8x7B-v0.1": 58.10,
    },
    "mmlu": {
        "meta-llama/Llama-3.1-8B-Instruct": 68.20,
        "meta-llama/Llama-3.2-1B": 31.10,
        "Qwen/Qwen2.5-7B-Instruct": 74.30,
        "mistralai/Mixtral-8x7B-v0.1": 70.60,
    },
    "cnn_dailymail": {
        "meta-llama/Llama-3.1-8B-Instruct": 33.90,
    },
}


class Evaluator:
    """One benchmark task (reference: evaluate/interface.py Evaluator)."""
    name = "base"

    def __init__(self, data_path: Optional[str] = None,
                 max_samples: int = 200, num_shots: int = 0,
                 max_tokens: int = 256):
        self.data_path = data_path
        self.max_samples = max_samples
        self.num_shots = num_shots
        self.max_tokens = max_tokens

    def load_rows(self) -> List[dict]:
        if self.data_path is None:
            return self.sample_rows()
        rows = []
        with open(self.data_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        return rows[:self.max_samples]

    def sample_rows(self) -> List[dict]:  # pragma: no cover - overridden
        raise NotImplementedError

    def evaluate(self, llm) -> Dict[str, Any]:
        raise NotImplementedError

    def gate(self, score: float, num_samples: int,
             model_id: Optional[str], sigma: float = 50.0
             ) -> Optional[bool]:
        ref = REFERENCE_ACCURACY.get(self.name, {}).get(model_id or "")
        if ref is None:
            return None
        return hypothesis_test_pass(score, ref, num_samples, sigma)


@register_task("gsm8k")
class GSM8K(Evaluator):
    """Exact-match on the final number, k-shot chain-of-thought prompt
    (reference task config: lm-eval gsm8k, flexible-extract filter)."""

    SHOT = ("Question: Tom has 3 apples and buys 5 more. How many apples "
            "does he have?\nAnswer: Tom starts with 3 apples and buys 5, "
            "so he has 3 + 5 = 8 apples. The answer is 8.\n\n")

    def sample_rows(self) -> List[dict]:
        return [
            {"question": "What is 2 + 3?", "answer": "#### 5"},
            {"question": "What is 10 - 4?", "answer": "#### 6"},
        ]

    @staticmethod
    def extract_number(text: str) -> Optional[str]:
        m = re.findall(r"-?[\d,]*\.?\d+", text.replace(",", ""))
        return m[-1] if m else None

    def evaluate(self, llm) -> Dict[str, Any]:
        from ..sampling_params import SamplingParams
        rows = self.load_rows()
        prefix = self.SHOT * self.num_shots
        prompts = [f"{prefix}Question: {r['question']}\nAnswer:"
                   for r in rows]
        sp = SamplingParams(max_tokens=self.max_tokens, temperature=0.0,
                            stop=["Question:"])
        outs = llm.generate(prompts, sp)
        correct = 0
        for r, o in zip(rows, outs):
            got = self.extract_number(o.outputs[0].text or "")
            gold = self.extract_number(str(r["answer"]))
            correct += int(got is not None and got == gold)
        acc = 100.0 * correct / max(len(rows), 1)
        return {"task": "gsm8k", "accuracy": round(acc, 2),
                "num_samples": len(rows)}


@register_task("mmlu")
class MMLU(Evaluator):
    """4-way multiple choice scored by continuation log-likelihood —
    more robust than generation parsing and exactly the lm-eval
    'loglikelihood' protocol (reference: lm_eval.py loglikelihood
    requests; uses teacher-forced scoring, no sampling)."""

    CHOICES = "ABCD"

    def sample_rows(self) -> List[dict]:
        return [
            {"question": "What is the capital of France?",
             "choices": ["Paris", "London", "Berlin", "Rome"],
             "answer": 0},
            {"question": "2 + 2 equals?",
             "choices": ["3", "4", "5", "6"], "answer": 1},
        ]

    def evaluate(self, llm) -> Dict[str, Any]:
        from .perplexity import score_token_logprobs
        rows = self.load_rows()
        if llm.tokenizer is None:
            raise ValueError("mmlu needs a tokenizer")
        correct = 0
        for r in rows:
            q = f"Question: {r['question']}\nAnswer:"
            scores = []
            for choice in r["choices"]:
                ids_q = llm.tokenizer.encode(q)
                ids_full = llm.tokenizer.encode(q + " " + str(choice))
                lp = score_token_logprobs(llm.model, llm.engine.params,
                                          ids_full)
                # sum logprob over the choice continuation only
                cont = len(ids_full) - len(ids_q)
                scores.append(float(lp[-cont:].sum()))
            pred = max(range(len(scores)), key=scores.__getitem__)
            gold = r["answer"]
            if isinstance(gold, str):
                gold = self.CHOICES.index(gold.strip().upper()[0])
            correct += int(pred == gold)
        acc = 100.0 * correct / max(len(rows), 1)
        return {"task": "mmlu", "accuracy": round(acc, 2),
                "num_samples": len(rows)}


@register_task("cnn_dailymail")
class CnnDailymail(Evaluator):
    """Summarization gated on ROUGE-L F1 (reference: accuracy suite's
    cnn_dailymail rouge gates). ROUGE-L is computed in-repo via LCS —
    no rouge_score dependency."""

    def sample_rows(self) -> List[dict]:
        return [{"article": "The cat sat on the mat. It was a sunny day "
                            "in the small town.",
                 "highlights": "A cat sat on a mat on a sunny day."}]

    @staticmethod
    def rouge_l_f1(cand: str, ref: str) -> float:
        a = re.findall(r"\w+", cand.lower())
        b = re.findall(r"\w+", ref.lower())
        if not a or not b:
            return 0.0
        # O(len(a)*len(b)) LCS, two-row DP
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, 1):
                cur.append(prev[j - 1] + 1 if x == y
                           else max(prev[j], cur[-1]))
            prev = cur
        lcs = prev[-1]
        p, r = lcs / len(a), lcs / len(b)
        return 0.0 if p + r == 0 else 2 * p * r / (p + r)

    def evaluate(self, llm) -> Dict[str, Any]:
        from ..sampling_params import SamplingParams
        rows = self.load_rows()
        prompts = [f"Summarize the following article:\n"
                   f"{r['article']}\nSummary:" for r in rows]
        sp = SamplingParams(max_tokens=self.max_tokens, temperature=0.0)
        outs = llm.generate(prompts, sp)
        scores = [100.0 * self.rouge_l_f1(o.outputs[0].text or "",
                                          r["highlights"])
                  for r, o in zip(rows, outs)]
        avg = sum(scores) / max(len(scores), 1)
        return {"task": "cnn_dailymail", "rouge_l": round(avg, 2),
                "num_samples": len(rows)}


@register_task("passkey")
class PasskeyRetrieval(Evaluator):
    """Needle-in-a-haystack retrieval (reference:
    tests/integration/defs/accuracy/references/passkey_retrieval_128k.yaml
    + the passkey prompts in evaluate/lm_eval long-context suites): a
    random digit passkey is hidden at a controlled depth inside filler;
    the model must reproduce it when re-prompted. Byte-level prompts
    (token id == byte) so the task runs tokenizer-free on the committed
    tiny checkpoints; ``context_len`` and ``depths`` sweep the haystack.
    """

    def __init__(self, context_len: int = 768,
                 depths=(0.15, 0.35, 0.55, 0.75, 0.9),
                 num_keys: int = 2, seed: int = 0,
                 style: str = "text", **kw):
        super().__init__(**kw)
        self.context_len = context_len
        self.depths = tuple(depths)
        self.num_keys = num_keys
        self.seed = seed
        # "text": PASSKEY = 'x' prose needles (big models);
        # "marker": \x01 <key> \x02 needles, query = bare \x01 — the
        # tinypasskey checkpoint's trained format
        self.style = style

    FILLER_LINES = (
        b"def update(self, x):\n    return x + 1\n",
        b"for i in range(8):\n    total += vals[i]\n",
        b"if cond:\n    out = fn(a, b)\n",
        b"while ok:\n    step(world)\n",
    )

    def make_rows(self):
        import numpy as _np
        rng = _np.random.default_rng(self.seed)
        rows = []
        for depth in self.depths:
            for _ in range(self.num_keys):
                key = "".join(rng.choice(list("0123456789"), 5))
                filler = b""
                while len(filler) < self.context_len:
                    filler += self.FILLER_LINES[
                        int(rng.integers(len(self.FILLER_LINES)))]
                if self.style == "marker":
                    needle = b"\x01" + key.encode() + b"\x02"
                    tail = b"\x01"
                else:
                    needle = f"PASSKEY = '{key}'\n".encode()
                    tail = b"PASSKEY = '"
                room = self.context_len - len(needle) - len(tail)
                pos = int(room * depth)
                doc = filler[:pos] + needle + \
                    filler[pos:room] + tail
                rows.append({"prompt": list(doc), "key": key,
                             "depth": depth})
        return rows

    def evaluate(self, llm) -> Dict[str, Any]:
        from ..sampling_params import SamplingParams
        rows = self.make_rows()
        sp = SamplingParams(max_tokens=8, top_k=1, ignore_eos=True)
        futs = [llm.generate_async(r["prompt"], sp) for r in rows]
        hits, per_depth = 0, {}
        outputs = []
        for r, f in zip(rows, futs):
            out = bytes(t & 0xFF for t in
                        f.result(600).outputs[0].token_ids)
            text = out.decode(errors="replace")
            hit = r["key"] in text
            hits += hit
            per_depth.setdefault(r["depth"], []).append(hit)
            outputs.append(text)
        return {"task": "passkey", "num_samples": len(rows),
                "accuracy": 100.0 * hits / max(1, len(rows)),
                "per_depth": {d: 100.0 * sum(v) / len(v)
                              for d, v in per_depth.items()},
                "outputs": outputs}
