"""Sleep/wake, weight update, top-k logprobs, penalties e2e, detokenizer,
accuracy-core math."""
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


@pytest.fixture(scope="module")
def tiny():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    yield llm, tmodel
    llm.shutdown()


def test_sleep_wake_roundtrip(tiny):
    llm, _ = tiny
    before = llm.generate([5, 9, 23], SamplingParams(max_tokens=4, top_k=1))
    llm.release_memory()
    assert llm.engine.params is None
    llm.resume_memory()
    after = llm.generate([5, 9, 23], SamplingParams(max_tokens=4, top_k=1))
    assert before.outputs[0].token_ids == after.outputs[0].token_ids


def test_update_weights_changes_outputs(tiny):
    llm, tmodel = tiny
    import torch
    base = llm.generate([7, 8, 9], SamplingParams(max_tokens=4, top_k=1))
    # perturb and hot-swap
    sd = {k: v + 0.05 * torch.randn_like(v)
          for k, v in tmodel.state_dict().items()}
    llm.update_weights(sd)
    new = llm.generate([7, 8, 9], SamplingParams(max_tokens=4, top_k=1))
    llm.update_weights(tmodel.state_dict())  # restore
    back = llm.generate([7, 8, 9], SamplingParams(max_tokens=4, top_k=1))
    assert back.outputs[0].token_ids == base.outputs[0].token_ids
    assert new.outputs[0].token_ids != base.outputs[0].token_ids


def test_top_logprobs_returned(tiny):
    llm, _ = tiny
    out = llm.generate([3, 5, 7], SamplingParams(max_tokens=3, top_k=1,
                                                 logprobs=5))
    lps = out.outputs[0].logprobs
    assert len(lps) == 3
    for entry, tok in zip(lps, out.outputs[0].token_ids):
        assert tok in entry
        assert len(entry) >= 5
        assert all(v <= 0 for v in entry.values())


def test_penalties_e2e_changes_output(tiny):
    llm, _ = tiny
    plain = llm.generate([4] * 8, SamplingParams(max_tokens=10, top_k=1))
    pen = llm.generate([4] * 8, SamplingParams(
        max_tokens=10, top_k=1, repetition_penalty=5.0,
        frequency_penalty=2.0))
    # strong penalties must change a repetitive greedy continuation
    assert plain.outputs[0].token_ids != pen.outputs[0].token_ids
    # ... and reduce repetition
    def max_run(ts):
        best = cur = 1
        for a, b in zip(ts, ts[1:]):
            cur = cur + 1 if a == b else 1
            best = max(best, cur)
        return best
    assert max_run(pen.outputs[0].token_ids) <= \
        max(2, max_run(plain.outputs[0].token_ids))


def test_accuracy_core_math():
    from tensorrt_llm_tpu.evaluate.accuracy_core import (
        compute_theta, compute_threshold, hypothesis_test_pass)
    thr = compute_threshold(num_samples=400, reference_accuracy=74.2,
                            sigma=40.0)
    assert 65 < thr < 74.2
    assert hypothesis_test_pass(73.0, 74.2, 400, 40.0)
    assert not hypothesis_test_pass(60.0, 74.2, 400, 40.0)
    assert compute_theta(400, 40.0) > 0


def test_incremental_detokenizer():
    from tensorrt_llm_tpu.runtime.detokenizer import IncrementalDetokenizer

    class FakeTok:
        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (i % 26)) for i in ids)

    d = IncrementalDetokenizer(FakeTok())
    assert d.put([0, 1]) == "ab"
    assert d.put([2]) == "c"
    assert d.finish() == ""
    assert d.full_text == "abc"


def test_prompt_embeds_override(tiny):
    """Prompt-embedding input path (multimodal foundation): feeding the
    model's own embedding rows must reproduce the token-id result."""
    import numpy as np
    llm, tmodel = tiny
    prompt = [5, 9, 23, 44, 17]
    ref = llm.generate(prompt, SamplingParams(max_tokens=5, top_k=1))
    embeds = tmodel.get_input_embeddings().weight.detach().numpy()[prompt]
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    req = LlmRequest(prompt_token_ids=list(prompt),
                     sampling_params=SamplingParams(max_tokens=5, top_k=1),
                     prompt_embeds=np.asarray(embeds, np.float32))
    out = llm.executor.submit(req).result(60)
    got = out.request.output_token_ids
    assert got == ref.outputs[0].token_ids


def test_abort_request(tiny):
    llm, _ = tiny
    fut = llm.generate_async([9, 8, 7], SamplingParams(max_tokens=10000,
                                                       top_k=1))
    import time
    time.sleep(0.2)
    llm.abort_request(fut.request_id)
    out = fut.result(timeout=30)
    assert out.finished


def test_per_request_seed_reproducible(tiny):
    llm, _ = tiny
    sp = lambda: SamplingParams(max_tokens=10, temperature=1.5, top_k=0,
                                seed=1234)
    a = llm.generate([7, 3, 99], sp())
    b = llm.generate([7, 3, 99], sp())
    assert a.outputs[0].token_ids == b.outputs[0].token_ids
    c = llm.generate([7, 3, 99], SamplingParams(
        max_tokens=10, temperature=1.5, top_k=0, seed=777))
    assert c.outputs[0].token_ids != a.outputs[0].token_ids


def test_bad_token_ids(tiny):
    llm, _ = tiny
    base = llm.generate([5, 9, 23], SamplingParams(max_tokens=6, top_k=1))
    banned = base.outputs[0].token_ids[0]
    out = llm.generate([5, 9, 23], SamplingParams(
        max_tokens=6, top_k=1, bad_token_ids=[banned]))
    assert banned not in out.outputs[0].token_ids


def test_shutdown_with_pending_requests():
    """Shutdown must not hang; queued requests resolve or
    error out rather than deadlock."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=128)
    llm = LLM(model=LlamaForCausalLM(cfg).eval(), skip_tokenizer_init=True,
              dtype="float32", max_batch_size=2, max_input_len=16,
              max_seq_len=64, max_num_tokens=64,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=256))
    futs = [llm.generate_async([1, 2, 3], SamplingParams(max_tokens=20,
                                                         top_k=1))
            for _ in range(6)]
    import time
    time.sleep(0.3)
    llm.shutdown()   # must return promptly


def test_executor_error_propagates():
    """A poisoned step must error the affected futures, not hang."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=128)
    llm = LLM(model=LlamaForCausalLM(cfg).eval(), skip_tokenizer_init=True,
              dtype="float32", max_batch_size=2, max_input_len=16,
              max_seq_len=64, max_num_tokens=64,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=256))
    def boom(*a, **k):
        raise RuntimeError("injected failure")
    llm.engine.forward_step = boom
    fut = llm.generate_async([1, 2, 3], SamplingParams(max_tokens=4))
    with pytest.raises(RuntimeError, match="injected failure"):
        fut.result(timeout=30)
    llm.shutdown()


def test_postprocess_workers_stream(model_fixture_or_none=None):
    """num_postprocess_workers: streamed chunks decode off the executor
    loop; order and content identical to inline decoding
    (reference: executor/postproc_worker.py)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()

    class Tok:
        eos_token_id = 0
        vocab_size = 128

        def encode(self, text, add_special_tokens=True):
            return [ord(c) % 96 + 2 for c in text][:16]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + i % 26) for i in ids)

        def __len__(self):
            return 128

    def run(n_workers):
        llm = LLM(model=tmodel, tokenizer=Tok(), dtype="float32",
                  max_batch_size=4, max_input_len=64, max_seq_len=128,
                  max_num_tokens=256, num_postprocess_workers=n_workers,
                  kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                                max_tokens=1024))
        fut = llm.generate_async([5, 9, 23, 44], SamplingParams(
            max_tokens=10, top_k=1), streaming=True)
        chunks = [(tuple(c.token_ids), c.text) for c in fut]
        final = fut.result(60).outputs[0]
        llm.shutdown()
        return chunks, final.text, final.token_ids

    c0, t0, ids0 = run(0)
    c2, t2, ids2 = run(2)
    assert ids0 == ids2
    assert t0 == t2 and t0 != ""
    assert c0 == c2


def test_sharded_checkpoint_lazy_load(tmp_path):
    """HF sharded safetensors (index.json + shards) load lazily (mmap'd,
    per-tensor materialization) and match the inline model exactly
    (reference: streamed weight_loader)."""
    import json
    import numpy as np
    import torch
    from safetensors import numpy as st_numpy
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    from tensorrt_llm_tpu.quantization.lazy_state_dict import LazyStateDict

    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    # split into two shards with an index
    names = sorted(sd)
    half = len(names) // 2
    shards = {"model-00001-of-00002.safetensors": names[:half],
              "model-00002-of-00002.safetensors": names[half:]}
    weight_map = {}
    for fname, keys in shards.items():
        st_numpy.save_file({k: sd[k] for k in keys}, str(tmp_path / fname))
        weight_map.update({k: fname for k in keys})
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map}))
    cfg.save_pretrained(tmp_path)

    lazy = LazyStateDict(tmp_path)
    assert len(lazy) == len(sd)
    np.testing.assert_array_equal(lazy["model.embed_tokens.weight"],
                                  sd["model.embed_tokens.weight"])

    base = LLM(model=hf, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=4, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=1024))
    sp = SamplingParams(max_tokens=8, top_k=1)
    ref = base.generate([5, 9, 23, 44], sp).outputs[0].token_ids
    base.shutdown()

    disk = LLM(model=str(tmp_path), skip_tokenizer_init=True,
               dtype="float32", max_batch_size=4, max_input_len=64,
               max_seq_len=128, max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=1024))
    got = disk.generate([5, 9, 23, 44], sp).outputs[0].token_ids
    disk.shutdown()
    assert got == ref


def test_prompt_logprobs(tiny):
    """prompt_logprobs returns per-prompt-position dicts that agree with
    the teacher-forced scoring harness (reference: SamplingParams
    .prompt_logprobs + gather_context_logits)."""
    llm, tmodel = tiny
    prompt = [3, 11, 42, 7, 19]
    out = llm.generate(prompt, SamplingParams(max_tokens=2, top_k=1,
                                              prompt_logprobs=3))
    plp = out.prompt_logprobs
    assert len(plp) == len(prompt)
    assert plp[0] is None
    for t, entry in zip(prompt[1:], plp[1:]):
        assert t in entry                       # actual token present
        assert len(entry) >= 3                  # plus top-k
        assert all(v <= 1e-6 for v in entry.values())
    # actual-token values match the standalone scoring harness
    from tensorrt_llm_tpu.evaluate.perplexity import score_token_logprobs
    ref = score_token_logprobs(llm.model, llm.engine.params, prompt)
    got = [plp[i + 1][prompt[i + 1]] for i in range(len(prompt) - 1)]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
