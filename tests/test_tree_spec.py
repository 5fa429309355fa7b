"""Tree-draft speculative decoding: ancestry-masked verification,
tree acceptance walk, and device KV compaction of accepted branches
(reference: the speculativeDecoding tree-verify kernel family /
eagle tree drafting)."""
import pytest

from tensorrt_llm_tpu import SamplingParams
from tensorrt_llm_tpu.speculative.interface import Drafter


@pytest.fixture()
def repeat_model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      tie_word_embeddings=False)
    return LlamaForCausalLM(cfg).eval()


class JunkTreeDrafter(Drafter):
    """Binary tree of low-probability guesses: acceptance ~0, but the
    masked verify + rewind must be lossless."""

    def prepare_draft_tokens(self, requests):
        for req in requests:
            last = req.all_token_ids[-1]
            # node0, node1 children of root; node2 child of node0
            req.draft_tokens = [(last + 7) % 60, (last + 13) % 60,
                                (last + 23) % 60]
            req.draft_parents = [-1, -1, 0]


class OracleTreeDrafter(Drafter):
    """Knows the true greedy continuation: first root child is junk,
    SECOND root child is correct, and its child continues correctly —
    exercises non-trivial path acceptance + KV slot compaction."""

    def __init__(self, max_draft_len, oracle):
        super().__init__(max_draft_len)
        self.oracle = oracle            # prompt-tuple -> full token list

    def prepare_draft_tokens(self, requests):
        for req in requests:
            req.draft_tokens = []
            req.draft_parents = None
            full = self.oracle.get(tuple(req.prompt_token_ids))
            if full is None:
                continue
            n = req.num_output_tokens
            if n + 2 >= len(full):
                continue
            good1, good2 = full[n], full[n + 1]
            req.draft_tokens = [(good1 + 31) % 60, good1, good2]
            req.draft_parents = [-1, -1, 1]


def _run(model, prompts, sp, drafter=None, max_draft_len=0):
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig
    kw = dict(model=model, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=8, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    if drafter is not None:
        kw["speculative_config"] = SpeculativeConfig(
            mode="USER_PROVIDED", max_draft_len=max_draft_len,
            draft_model=drafter)
    llm = LLM(**kw)
    outs = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
    llm.shutdown()
    return outs


def test_tree_spec_lossless_junk(repeat_model):
    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3], [11] * 12]
    sp = SamplingParams(max_tokens=14, top_k=1, end_id=-1)
    ref = _run(repeat_model, prompts, sp)
    got = _run(repeat_model, prompts, sp, JunkTreeDrafter(3), 3)
    assert got == ref


def test_tree_spec_accepts_correct_branch(repeat_model):
    """The oracle's correct branch sits at node index 1 (not 0), so any
    acceptance requires the ancestry mask AND the KV compaction of
    slots (1, 2) onto positions (+1, +2)."""
    prompts = [[5, 9, 23, 44, 17], [11] * 12]
    sp = SamplingParams(max_tokens=14, top_k=1, end_id=-1)
    ref = _run(repeat_model, prompts, sp)
    oracle = {tuple(p): r for p, r in zip(prompts, ref)}
    drafter = OracleTreeDrafter(3, oracle)
    got = _run(repeat_model, prompts, sp, drafter, 3)
    assert got == ref


def test_tree_and_chain_mixed_batch(repeat_model):
    """Tree and chain requests in one engine: chain semantics untouched."""
    from tensorrt_llm_tpu.speculative.ngram import NGramDrafter

    class MixDrafter(Drafter):
        def __init__(self, max_draft_len):
            super().__init__(max_draft_len)
            self.ngram = NGramDrafter(max_draft_len=max_draft_len)

        def prepare_draft_tokens(self, requests):
            for k, req in enumerate(requests):
                if req.request_id % 2 == 0:
                    self.ngram.prepare_draft_tokens([req])
                    req.draft_parents = None
                else:
                    last = req.all_token_ids[-1]
                    req.draft_tokens = [(last + 7) % 60, (last + 13) % 60]
                    req.draft_parents = [-1, 0]

    prompts = [[3, 3, 7, 3, 3, 7, 3, 3], [5, 9, 23, 44], [11] * 10]
    sp = SamplingParams(max_tokens=12, top_k=1, end_id=-1)
    ref = _run(repeat_model, prompts, sp)
    got = _run(repeat_model, prompts, sp, MixDrafter(2), 2)
    assert got == ref


def test_eagle3_tree_proposal_lossless(repeat_model):
    """EAGLE3 with top-b TREE proposal (speculative/eagle.py
    _build_tree_fn): random head => ~zero acceptance, but the node-
    indexed head KV, ancestry-mask expansion and tree verify must stay
    lossless vs baseline greedy."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3]]
    sp = SamplingParams(max_tokens=12, top_k=1)
    kw = dict(model=repeat_model, skip_tokenizer_init=True,
              dtype="float32", max_batch_size=8, max_input_len=64,
              max_seq_len=160, max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    base = LLM(**kw)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()
    spec = LLM(speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=6, eagle_tree_width=2), **kw)
    assert spec.engine.sd is None       # trees take the host path
    assert spec.executor.drafter.tree_width == 2
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref


def test_eagle3_tree_shape_contract(repeat_model):
    """The tree drafter emits BFS-ordered nodes with valid parents."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    kw = dict(model=repeat_model, skip_tokenizer_init=True,
              dtype="float32", max_batch_size=4, max_input_len=32,
              max_seq_len=96, max_num_tokens=128,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    spec = LLM(speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=6, eagle_tree_width=3), **kw)
    drafter = spec.executor.drafter
    seen = {}
    orig = drafter.prepare_draft_tokens

    def spy(reqs):
        orig(reqs)
        for r in reqs:
            if r.draft_tokens:
                seen[r.request_id] = (list(r.draft_tokens),
                                      list(r.draft_parents or []))
    drafter.prepare_draft_tokens = spy
    spec.generate([5, 9, 23], SamplingParams(max_tokens=8, top_k=1))
    spec.shutdown()
    assert seen, "tree drafter never proposed"
    toks, parents = next(iter(seen.values()))
    assert len(toks) == len(parents) == 6      # b=3 x depth=2
    for j, p in enumerate(parents):
        assert p < j                            # BFS: parent before child
        if j < 3:
            assert p == -1                      # level-0 roots
        else:
            assert 0 <= p < 3                   # children of level 0


def test_eagle3_dynamic_tree_lossless(repeat_model):
    """Dynamic tree (global top-budget pool cut, reference:
    eagle3_dynamic_tree.py): still lossless vs plain greedy, with
    topologically-valid parents."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3]]
    sp = SamplingParams(max_tokens=12, top_k=1)
    kw = dict(model=repeat_model, skip_tokenizer_init=True,
              dtype="float32", max_batch_size=8, max_input_len=64,
              max_seq_len=160, max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    base = LLM(**kw)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()
    spec = LLM(speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=6, eagle_tree_width=2,
        eagle_dynamic_tree=True), **kw)
    drafter = spec.executor.drafter
    assert drafter.dynamic_tree
    seen = []
    orig = drafter.prepare_draft_tokens

    def spy(reqs):
        orig(reqs)
        for r in reqs:
            if r.draft_tokens:
                seen.append((list(r.draft_tokens),
                             list(r.draft_parents or [])))
    drafter.prepare_draft_tokens = spy
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref
    assert seen, "dynamic tree never proposed"
    for toks, pars in seen:
        assert len(toks) <= 6                      # budget respected
        assert len(toks) == len(pars)
        for j, p in enumerate(pars):
            assert p < j, f"parent {p} not before child {j}"  # topo order
    # the pool cut may produce levels wider than the expansion beam or
    # uneven depth — at least one proposal should differ from the
    # static b-per-level rectangle
    shapes = {tuple(pars) for _, pars in seen}
    assert shapes, shapes
