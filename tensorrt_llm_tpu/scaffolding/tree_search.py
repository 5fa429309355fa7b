"""Tree-search inference-time compute: MCTS + Tree-of-Thoughts.

Behavioral reference: tensorrt_llm/scaffolding/contrib/TreeInference/
tree_controllers.py (MCTSController, TOTController) and the reward
workers (scaffolding/controller.py NativeRewardController / PRM
scoring). Re-designed around this repo's async LLM futures: every
expansion/simulation fans out through ``generate_async`` so the
executor's continuous batching parallelizes the tree, and rewards come
from a pluggable RewardWorker (callable heuristics, or the LLM's own
sequence logprob as a PRM-free default).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Sequence


@dataclasses.dataclass
class TreeNode:
    state: str = ""                       # accumulated thought text
    parent: Optional["TreeNode"] = None
    children: List["TreeNode"] = dataclasses.field(default_factory=list)
    visits: int = 0
    value: float = 0.0
    depth: int = 0
    terminal: bool = False

    def add_child(self, state: str) -> "TreeNode":
        child = TreeNode(state=state, parent=self, depth=self.depth + 1)
        self.children.append(child)
        return child

    def path_text(self) -> str:
        parts = []
        node = self
        while node is not None:
            if node.state:
                parts.append(node.state)
            node = node.parent
        return "\n".join(reversed(parts))

    def ucb1(self, c: float = 1.414) -> float:
        if self.visits == 0:
            return float("inf")
        exploit = self.value / self.visits
        explore = c * math.sqrt(
            math.log(max(self.parent.visits, 1)) / self.visits) \
            if self.parent else 0.0
        return exploit + explore


class RewardWorker:
    """Scores candidate texts (reference: NativeRewardController /
    reward workers). Default: mean sequence logprob under the SAME
    model — a PRM-free self-confidence score; pass ``reward_fn`` for a
    task heuristic or an external PRM."""

    def __init__(self, reward_fn: Optional[Callable[[str], float]] = None):
        self.reward_fn = reward_fn

    def score(self, llm, prompt: str, texts: Sequence[str]) -> List[float]:
        assert self.reward_fn is not None, \
            "PRM-free mode scores via generation confidence (callers " \
            "use the per-token logprob the futures already carry)"
        return [float(self.reward_fn(t)) for t in texts]


def _gen_texts(llm, prompts, sp, n_per=1, temperature=0.8):
    futs = []
    for p in prompts:
        for i in range(n_per):
            spp = dataclasses.replace(
                sp, temperature=temperature * (1.0 + 0.07 * i),
                top_k=0 if sp.top_k in (0, 1) else sp.top_k)
            futs.append(llm.generate_async(p, spp))
    texts, scores = [], []
    for f in futs:
        o = f.result().outputs[0]
        texts.append(o.text or " ".join(map(str, o.token_ids)))
        n = max(1, len(o.token_ids))
        scores.append((o.cumulative_logprob or 0.0) / n)
    return texts, scores


class MCTSController:
    """Monte-Carlo tree search over thought steps (reference:
    TreeInference MCTSController): UCB1 selection → k-way expansion →
    rollout simulation → reward → backpropagation; the answer is the
    best-value root-to-leaf path's final rollout."""

    def __init__(self, iterations: int = 8, expand_k: int = 2,
                 max_depth: int = 3, exploration: float = 1.414,
                 reward: Optional[RewardWorker] = None,
                 temperature: float = 0.8):
        self.iterations = iterations
        self.expand_k = expand_k
        self.max_depth = max_depth
        self.exploration = exploration
        self.reward = reward or RewardWorker()
        self.temperature = temperature

    def run(self, llm, prompt, sampling_params) -> "ScaffoldingResult":
        from .controllers import ScaffoldingResult
        if not isinstance(prompt, str):
            raise TypeError("tree search needs a text prompt")
        root = TreeNode()
        best_text, best_score = None, -float("inf")
        step_sp = dataclasses.replace(sampling_params)
        for _ in range(self.iterations):
            # 1) select: UCB1 walk to a leaf
            node = root
            while node.children and node.depth < self.max_depth:
                node = max(node.children,
                           key=lambda n: n.ucb1(self.exploration))
            # 2) expand: k candidate next thoughts
            if node.depth < self.max_depth and not node.terminal:
                ctx = prompt
                if node.path_text():
                    ctx = f"{prompt}\n{node.path_text()}"
                thoughts, _ = _gen_texts(llm, [ctx], step_sp,
                                         n_per=self.expand_k,
                                         temperature=self.temperature)
                for t in thoughts:
                    node.add_child(t.strip())
                if node.children:
                    node = node.children[0]
            # 3) simulate: one rollout from the selected node
            ctx = f"{prompt}\n{node.path_text()}" if node.path_text() \
                else prompt
            rollout, conf = _gen_texts(llm, [ctx], step_sp, n_per=1,
                                       temperature=self.temperature)
            full = (node.path_text() + "\n" + rollout[0]).strip()
            r = self.reward.score(llm, prompt, [full])[0] \
                if self.reward.reward_fn is not None else conf[0]
            if r > best_score:
                best_score, best_text = r, full
            # 4) backpropagate
            while node is not None:
                node.visits += 1
                node.value += r
                node = node.parent
        cands = [c.state for c in root.children]
        return ScaffoldingResult(best=best_text or "",
                                 candidates=cands,
                                 scores=[c.value / max(c.visits, 1)
                                         for c in root.children])


class TOTController:
    """Tree-of-Thoughts breadth search (reference: TOTController):
    at each level every frontier node proposes k thoughts; the reward
    worker prunes to ``beam`` survivors; final answers come from the
    surviving leaves' completions."""

    def __init__(self, depth: int = 2, branch: int = 3, beam: int = 2,
                 reward: Optional[RewardWorker] = None,
                 temperature: float = 0.8):
        self.depth = depth
        self.branch = branch
        self.beam = beam
        self.reward = reward or RewardWorker()
        self.temperature = temperature

    def run(self, llm, prompt, sampling_params) -> "ScaffoldingResult":
        from .controllers import ScaffoldingResult
        frontier = [""]
        step_sp = dataclasses.replace(sampling_params)
        for _ in range(self.depth):
            ctxs = [f"{prompt}\n{f}".strip() for f in frontier]
            thoughts, confs = _gen_texts(llm, ctxs, step_sp,
                                         n_per=self.branch,
                                         temperature=self.temperature)
            cands, cscores = [], []
            for i, f in enumerate(frontier):
                for j in range(self.branch):
                    t = thoughts[i * self.branch + j].strip()
                    cands.append((f + "\n" + t).strip())
                    cscores.append(confs[i * self.branch + j])
            if self.reward.reward_fn is not None:
                cscores = self.reward.score(llm, prompt, cands)
            order = sorted(range(len(cands)), key=lambda i: -cscores[i])
            frontier = [cands[i] for i in order[:self.beam]]
            last_scores = [cscores[i] for i in order[:self.beam]]
        return ScaffoldingResult(best=frontier[0], candidates=frontier,
                                 scores=last_scores)
