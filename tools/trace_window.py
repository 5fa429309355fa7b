#!/usr/bin/env python
"""Capture a jax.profiler device trace of one steady decode window and
print the top device ops by total time (parsed from the .trace.json.gz
the profiler writes — no TensorBoard needed)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_anatomy_cache"))
    from transformers import LlamaConfig
    from tensorrt_llm_tpu.llmapi.llm_args import KvCacheConfig, LlmArgs
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest, LlmRequestState
    from tensorrt_llm_tpu.runtime.scheduler import ScheduledRequests
    from tensorrt_llm_tpu.sampling_params import SamplingParams
    from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
    import jax.numpy as jnp

    batch = int(os.environ.get("ANAT_BATCH", "256"))
    K = int(os.environ.get("ANAT_K", "16"))
    ctx = int(os.environ.get("ANAT_CTX", "184"))
    hf = LlamaConfig(vocab_size=32000, hidden_size=2048,
                     intermediate_size=5632, num_hidden_layers=22,
                     num_attention_heads=16, num_key_value_heads=4,
                     head_dim=128, max_position_embeddings=4096)
    args = LlmArgs(model="x", skip_tokenizer_init=True,
                   max_batch_size=batch, max_input_len=256,
                   max_seq_len=512, max_num_tokens=2048,
                   decode_multi_step=K,
                   kv_cache_config=KvCacheConfig(tokens_per_block=32))
    mc = ModelConfig(hf_config=hf, dtype=jnp.bfloat16, mapping=Mapping())
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = ModelEngine(model, params, args)
    print(f"# engine up, pages={engine.num_kv_pages}", flush=True)

    kv = KVCacheManager(engine.num_kv_pages, engine.page_size)
    reqs = []
    for i in range(batch):
        r = LlmRequest(prompt_token_ids=list(np.random.randint(
            1, hf.vocab_size - 1, size=ctx)),
            sampling_params=SamplingParams(max_tokens=256, top_k=1,
                                           ignore_eos=True))
        kv.add_sequence(r)
        r.state = LlmRequestState.GENERATION_IN_PROGRESS
        r.num_device_tokens = r.prompt_len
        r.seq_slot = i
        r.multi_step_budget = K
        for _ in range(K + 2):
            r.output_token_ids.append(1)
            kv.add_token(r)
        reqs.append(r)
    sched = ScheduledRequests(generation_requests=reqs)

    def one_window():
        toks, lps, emitted = engine.forward_multi_step(sched, K)
        jax.block_until_ready(emitted)
        return emitted

    em = one_window()
    print(f"# warm window done emitted={int(np.asarray(em).sum())}",
          flush=True)
    t0 = time.monotonic()
    one_window()
    print(f"# unprofiled window {time.monotonic()-t0:.3f}s", flush=True)

    tdir = "/tmp/jax_trace_window"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        one_window()
    # parse trace
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("# trace files:", files, flush=True)
    per_op = defaultdict(float)
    per_pid = defaultdict(float)
    pids = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pids[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("ph") == "X":
                name = ev.get("name", "")
                dur = ev.get("dur", 0) / 1e3  # ms
                pid = ev.get("pid")
                per_pid[pid] += dur
                per_op[(pid, name.split(".")[0])] += dur
    for pid, total in sorted(per_pid.items(), key=lambda x: -x[1]):
        print(f"## pid {pid} ({pids.get(pid,'?')}): {total:.1f}ms total")
    top = sorted(per_op.items(), key=lambda x: -x[1])[:40]
    for (pid, name), total in top:
        print(f"  {total:10.2f}ms  pid={pid:<4} {name[:110]}")


if __name__ == "__main__":
    main()
