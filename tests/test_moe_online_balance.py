"""Online wide-EP load balancing (VERDICT r4 #7).

Reference: _torch/modules/fused_moe/moe_load_balancer.py (per-expert
statistic collection in forward + background redistribution via
moeLoadBalancer.cpp). Here: the step program emits routed-token counts,
the executor's MoeLoadTracker EMAs them, and skew past the threshold
triggers engine.rebalance_moe mid-serve — with no output change.
"""
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


def _mixtral():
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM
    torch.manual_seed(0)
    cfg = MixtralConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=96, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        num_local_experts=4, num_experts_per_tok=2,
                        max_position_embeddings=256,
                        tie_word_embeddings=False)
    return MixtralForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def llm_balanced():
    llm = LLM(model=_mixtral(), skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256, decode_multi_step=1,
              moe_config={"load_balancer": {"interval": 2,
                                            "skew_threshold": 1.05,
                                            "min_samples": 2,
                                            "ema": 0.5}},
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    yield llm
    llm.shutdown()


def test_stats_collected_and_skew_triggers_rebalance(llm_balanced):
    llm = llm_balanced
    ex = llm.executor
    assert ex.moe_tracker is not None
    sp = SamplingParams(max_tokens=10, top_k=1, ignore_eos=True)
    ref = llm.generate([5, 9, 23, 44], sp).outputs[0].token_ids
    assert ex.moe_tracker.samples > 0, "no expert stats observed"
    assert ex.moe_tracker.loads is not None
    # real routing always has some imbalance; the aggressive threshold
    # guarantees the mid-serve trigger fired
    assert ex.moe_tracker.rebalances >= 1
    assert "w_gate_slots" in llm.engine.params["layers"]
    # placement change is output-invariant: same greedy stream after
    got = llm.generate([5, 9, 23, 44], sp).outputs[0].token_ids
    assert got == ref
    # iteration stats surface the skew (reference: IterationStats)
    st = ex.stats_history[-1]
    assert st.moe_expert_skew is not None and st.moe_expert_skew >= 1.0
    assert st.moe_rebalances >= 1


def test_tracker_unit_skew_and_trigger():
    from tensorrt_llm_tpu.runtime.moe_tracker import MoeLoadTracker

    class FakeEngine:
        def __init__(self):
            self.calls = []

        def rebalance_moe(self, loads):
            self.calls.append(np.asarray(loads))

    eng = FakeEngine()
    t = MoeLoadTracker(eng, interval=4, skew_threshold=1.5,
                       min_samples=3, ema=1.0)
    balanced = np.asarray([[10, 10, 10, 10]] * 2)
    for _ in range(8):
        t.observe(balanced)
    assert not eng.calls, "balanced loads must not trigger"
    hot = np.asarray([[40, 2, 2, 2]] * 2)
    for _ in range(8):
        t.observe(hot)
    assert eng.calls, "hot expert skew must trigger"
    assert t.skew() > 1.5
    np.testing.assert_allclose(eng.calls[0],
                               np.asarray([80.0, 4.0, 4.0, 4.0]))


def test_tracker_ignores_empty_counts():
    from tensorrt_llm_tpu.runtime.moe_tracker import MoeLoadTracker
    t = MoeLoadTracker(engine=None, interval=1, min_samples=1)
    t.observe(np.zeros((0,), np.int32))
    t.observe(np.zeros((2, 4), np.int32))
    assert t.samples == 0 and t.loads is None
