"""Scaffolding controllers (best-of-N, majority vote) over a tiny LLM."""
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.scaffolding import (BestOfNController,
                                          MajorityVoteController,
                                          ScaffoldingLlm)


@pytest.fixture(scope="module")
def llm():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    llm = LLM(model=LlamaForCausalLM(cfg).eval(), skip_tokenizer_init=True,
              dtype="float32", max_batch_size=8, max_input_len=64,
              max_seq_len=128, max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    yield llm
    llm.shutdown()


def test_best_of_n(llm):
    ctrl = BestOfNController(n=3, reward_fn=lambda s: -len(s))
    s = ScaffoldingLlm(llm, ctrl)
    res = s.generate([5, 9, 23], SamplingParams(max_tokens=8))
    assert len(res.candidates) == 3
    assert res.best in res.candidates
    assert res.scores is not None
    # reward_fn prefers the shortest
    assert len(res.best) == min(len(c) for c in res.candidates)


def test_majority_vote(llm):
    ctrl = MajorityVoteController(n=4, extract_fn=lambda t: t.split()[-1]
                                  if t.split() else t)
    s = ScaffoldingLlm(llm, ctrl)
    res = s.generate([3, 7, 11], SamplingParams(max_tokens=6))
    assert len(res.candidates) == 4
    assert res.best in res.candidates


class _FakeOutput:
    def __init__(self, text, lp):
        self.text = text
        self.token_ids = list(range(max(1, len(text) // 4)))
        self.cumulative_logprob = lp


class _FakeFuture:
    def __init__(self, text, lp):
        self._o = _FakeOutput(text, lp)

    def result(self, timeout=None):
        class R:
            pass
        r = R()
        r.outputs = [self._o]
        return r


class FakeLLM:
    """Scripted worker: thought quality is encoded in the text; calls
    are recorded so tree mechanics are checkable."""

    def __init__(self):
        self.calls = []
        self.i = 0

    def generate_async(self, prompt, sp):
        self.calls.append(prompt)
        self.i += 1
        # texts carry a deterministic "goodness" digit
        good = 9 if "good" in prompt else self.i % 5
        return _FakeFuture(f"thought{self.i} quality={good}", -1.0 / good
                           if good else -9.0)


def _reward(text: str) -> float:
    import re
    m = re.findall(r"quality=(\d)", text)
    return float(m[-1]) if m else 0.0


def test_mcts_controller_mechanics():
    from tensorrt_llm_tpu.scaffolding import (MCTSController,
                                              RewardWorker,
                                              ScaffoldingLlm)
    llm = FakeLLM()
    ctrl = MCTSController(iterations=4, expand_k=2, max_depth=2,
                          reward=RewardWorker(_reward))
    res = ScaffoldingLlm(llm, ctrl).generate(
        "solve it", SamplingParams(max_tokens=8))
    assert res.best
    assert _reward(res.best) == max(
        _reward(c) for c in res.candidates + [res.best])
    # selection + simulation actually fanned out through the worker
    assert len(llm.calls) >= 8
    assert res.scores and len(res.scores) == len(res.candidates)


def test_mcts_backprop_prefers_good_branch():
    from tensorrt_llm_tpu.scaffolding import MCTSController, RewardWorker
    from tensorrt_llm_tpu.scaffolding.tree_search import TreeNode
    # hand-built tree: backprop through ucb1
    root = TreeNode()
    a = root.add_child("a")
    b = root.add_child("b")
    for node, r, n in ((a, 1.0, 3), (b, 9.0, 3)):
        for _ in range(n):
            cur = node
            while cur is not None:
                cur.visits += 1
                cur.value += r
                cur = cur.parent
    assert b.ucb1(1.0) > a.ucb1(1.0)


def test_tot_controller_prunes_to_beam():
    from tensorrt_llm_tpu.scaffolding import (RewardWorker,
                                              ScaffoldingLlm,
                                              TOTController)
    llm = FakeLLM()
    ctrl = TOTController(depth=2, branch=3, beam=2,
                         reward=RewardWorker(_reward))
    res = ScaffoldingLlm(llm, ctrl).generate(
        "prove it", SamplingParams(max_tokens=8))
    assert len(res.candidates) == 2            # beam survivors
    assert res.scores == sorted(res.scores, reverse=True)
    # every surviving path is depth 2 (two thought lines)
    for c in res.candidates:
        assert c.count("thought") == 2


def test_reward_worker_callable():
    from tensorrt_llm_tpu.scaffolding import RewardWorker
    rw = RewardWorker(lambda t: len(t))
    assert rw.score(None, "p", ["ab", "abcd"]) == [2.0, 4.0]
