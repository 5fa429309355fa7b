"""Acceptance-driven speculation with a TRAINED EAGLE3 head
(round-3 VERDICT #2: the fused-window machinery existed but no
acceptance measurement had ever used trained weights).

tools/train_draft_head.py trains the head on tinycode-llama's own
features (capture via collect_hidden — the save_hidden_state port) with
target-argmax labels, so held-out top1 IS the expected greedy per-draft
acceptance (meta.json records it). These tests check the whole chain:
losslessness, real acceptance on held-out code, and the net
tokens-per-dispatch gain the acceptance buys."""
import json
from pathlib import Path

import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

CKPT = Path(__file__).parent / "assets" / "tinycode-llama"
HEAD = Path(__file__).parent / "assets" / "tinycode-eagle"

pytestmark = pytest.mark.skipif(
    not (HEAD / "model.safetensors").exists()
    or not (CKPT / "model.safetensors").exists(),
    reason="trained checkpoints missing (tools/train_tiny_checkpoint.py"
           " + tools/train_draft_head.py)")

# held-out code the target never saw verbatim (same family as
# tests/test_real_checkpoint.py)
PROMPT = (
    "def forward(self, params, token_ids, kv_pages, metadata):\n"
    "    logits, kv_pages = self.model.forward(params, token_ids,\n")


def byte_ids(text: str):
    return list(text.encode("utf-8"))


def make_llm(**kw):
    defaults = dict(model=str(CKPT), skip_tokenizer_init=True,
                    dtype="float32", max_batch_size=2,
                    max_input_len=256, max_seq_len=512,
                    max_num_tokens=512, enable_warmup=False,
                    kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                                  max_tokens=2048))
    defaults.update(kw)
    return LLM(**defaults)


def test_trained_head_metadata():
    meta = json.loads((HEAD / "meta.json").read_text())
    # the training-time acceptance proxy must be well above chance
    assert meta["val_top1"] >= 0.5, meta
    assert meta["target"] == "tinycode-llama"


def test_trained_head_lossless_and_accepts():
    sp = SamplingParams(max_tokens=96, top_k=1, ignore_eos=True)
    base = make_llm()
    ref = base.generate(byte_ids(PROMPT), sp).outputs[0].token_ids
    base.shutdown()
    spec = make_llm(speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=2, draft_model=str(HEAD),
        device_window=True))
    assert spec.engine.sd is not None
    got = spec.generate(byte_ids(PROMPT), sp).outputs[0].token_ids
    acc = list(spec.executor.drafter.acceptance_window)
    spec.shutdown()
    assert got == ref                       # lossless
    assert acc, "no window iterations recorded acceptance"
    mean_acc = float(np.mean(acc))          # drafts accepted / iteration
    # tokens per verify dispatch = 1 + mean_acc; the trained head's
    # val_top1 ~0.69 predicts ~1.0 extra; require a conservative floor
    # far above the untrained-head baseline (~0)
    assert mean_acc >= 0.5, (mean_acc, acc[:20])


def test_untrained_head_accepts_nothing_by_contrast():
    """Control: a random head on the same target accepts ~0 — the
    measured gain above is the TRAINING, not the machinery."""
    sp = SamplingParams(max_tokens=48, top_k=1, ignore_eos=True)
    spec = make_llm(speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=2, device_window=True))
    spec.generate(byte_ids(PROMPT), sp)
    acc = list(spec.executor.drafter.acceptance_window)
    spec.shutdown()
    assert acc
    assert float(np.mean(acc)) <= 0.2, acc[:20]


def test_trained_head_tokens_per_dispatch_gain():
    """The throughput mechanism: windows with the trained head emit
    more tokens per target dispatch (each window iteration = one
    full-weight verify pass). Measured on held-out code."""
    sp = SamplingParams(max_tokens=96, top_k=1, ignore_eos=True)
    out = {}
    for name, head in (("trained", str(HEAD)), ("random", None)):
        spec = make_llm(speculative_config=SpeculativeConfig(
            mode="EAGLE3", max_draft_len=2, draft_model=head,
            device_window=True))
        spec.generate(byte_ids(PROMPT), sp)
        acc = spec.executor.drafter.acceptance_window
        out[name] = 1.0 + float(np.mean(acc))
        spec.shutdown()
    # >= 1.4 tokens per verify vs ~1.0 for random: the acceptance pays
    assert out["trained"] >= 1.4, out
    assert out["trained"] > out["random"] + 0.3, out
