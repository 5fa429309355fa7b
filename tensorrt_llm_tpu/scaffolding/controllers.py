"""Inference-time-compute scaffolding.

Role of the reference ``scaffolding/`` package (reference:
tensorrt_llm/scaffolding/ — best-of-N, majority vote, reward-model
controllers orchestrating generation workers). Controllers compose the
async LLM API; sampling diversity comes from per-sample temperature
jitter (per-request seeds land with the sampler upgrade).
"""
from __future__ import annotations

import collections
import dataclasses
import re
from typing import Callable, List, Optional, Sequence

from ..sampling_params import SamplingParams


@dataclasses.dataclass
class ScaffoldingResult:
    best: str
    candidates: List[str]
    scores: Optional[List[float]] = None


class ScaffoldingLlm:
    """Thin orchestration wrapper over an ``LLM`` generation worker."""

    def __init__(self, llm, controller):
        self.llm = llm
        self.controller = controller

    def generate(self, prompt, sampling_params: Optional[SamplingParams] = None
                 ) -> ScaffoldingResult:
        return self.controller.run(self.llm, prompt,
                                   sampling_params or SamplingParams())


class BestOfNController:
    """Sample N candidates, score with ``reward_fn``, return the argmax
    (reference: scaffolding best-of-N controller)."""

    def __init__(self, n: int = 4,
                 reward_fn: Optional[Callable[[str], float]] = None,
                 temperature: float = 0.8):
        self.n = n
        self.reward_fn = reward_fn or (lambda s: float(len(s)))
        self.temperature = temperature

    def run(self, llm, prompt, sampling_params) -> ScaffoldingResult:
        futs = []
        for i in range(self.n):
            sp = dataclasses.replace(
                sampling_params,
                temperature=self.temperature * (1.0 + 0.05 * i),
                top_k=0 if sampling_params.top_k in (0, 1)
                else sampling_params.top_k)
            futs.append(llm.generate_async(prompt, sp))
        texts = []
        for f in futs:
            out = f.result()
            o = out.outputs[0]
            texts.append(o.text or " ".join(map(str, o.token_ids)))
        scores = [self.reward_fn(t) for t in texts]
        best = texts[max(range(len(texts)), key=lambda i: scores[i])]
        return ScaffoldingResult(best=best, candidates=texts, scores=scores)


class MajorityVoteController:
    """Self-consistency: sample N, extract answers, majority vote
    (reference: scaffolding majority-vote / GSM8K recipe)."""

    def __init__(self, n: int = 8, temperature: float = 0.7,
                 extract_fn: Optional[Callable[[str], str]] = None):
        self.n = n
        self.temperature = temperature
        self.extract_fn = extract_fn or self._last_number

    @staticmethod
    def _last_number(text: str) -> str:
        nums = re.findall(r"-?\d+\.?\d*", text)
        return nums[-1] if nums else text.strip()[-32:]

    def run(self, llm, prompt, sampling_params) -> ScaffoldingResult:
        sp = dataclasses.replace(sampling_params,
                                 temperature=self.temperature, top_k=0)
        futs = [llm.generate_async(prompt, dataclasses.replace(sp))
                for _ in range(self.n)]
        texts = []
        for f in futs:
            o = f.result().outputs[0]
            texts.append(o.text or " ".join(map(str, o.token_ids)))
        answers = [self.extract_fn(t) for t in texts]
        winner, _ = collections.Counter(answers).most_common(1)[0]
        best = texts[answers.index(winner)]
        return ScaffoldingResult(best=best, candidates=texts)
