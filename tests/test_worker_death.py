"""Multi-process control plane liveness (VERDICT r4 #10).

Reference: executor/proxy.py:430-503 — worker processes are monitored;
a dead worker produces per-request errors on the requests it owned,
never a hang, and the leader keeps serving. Here: a dp_follower OS
process is killed mid-serve; the leader must (a) error exactly the
requests routed to the dead rank, (b) finish its own, and (c) keep
serving new requests on the surviving ranks.
"""
import os
import socket
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_FOLLOWER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    sys.path.insert(0, {repo!r})
    from tensorrt_llm_tpu import LLM, KvCacheConfig

    port = int(sys.argv[1])
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=8, max_input_len=64, max_seq_len=160,
              max_num_tokens=256,
              orchestrator_config={{"role": "dp_follower", "port": port,
                                    "dp_rank": 1}},
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    print("FOLLOWER_READY", flush=True)
    llm.executor._thread.join()
""").format(repo=str(REPO))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def test_follower_death_fails_only_its_requests():
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    from tensorrt_llm_tpu.runtime.error_isolation import RequestError
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    follower = subprocess.Popen(
        [sys.executable, "-u", "-c", _FOLLOWER, str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True)
    llm = None
    try:
        # leader in THIS process (builds once the follower dials in)
        llm = LLM(model=_model(), skip_tokenizer_init=True,
                  dtype="float32", max_batch_size=8, max_input_len=64,
                  max_seq_len=160, max_num_tokens=256,
                  orchestrator_config={"role": "dp_leader", "port": port,
                                       "num_followers": 1},
                  kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                                max_tokens=2048))
        # several long generations: the token balancer alternates them
        # across rank 0 (leader) and rank 1 (the follower)
        sp = SamplingParams(max_tokens=60, top_k=1, ignore_eos=True)
        futs = [llm.generate_async([i + 1, i + 2, i + 3], sp)
                for i in range(6)]
        ex = llm.executor
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if any(r == 1 for r in ex.dp_assignments.values()):
                break
            time.sleep(0.05)
        routed_to_dead = [rid for rid, r in ex.dp_assignments.items()
                          if r == 1]
        assert routed_to_dead, "balancer never used the follower"
        follower.kill()
        follower.wait(timeout=30)

        failed, completed = [], []
        for f in futs:
            try:
                out = f.result(timeout=180)
                completed.append(out.request_id)
                assert len(out.outputs[0].token_ids) == 60
            except RequestError:
                failed.append(f.request_id)
        # exactly the dead rank's requests failed; the rest completed
        assert set(failed) == set(routed_to_dead), \
            (failed, routed_to_dead)
        assert completed, "leader's own requests must complete"

        # the leader keeps serving; new work avoids the dead rank
        out2 = llm.generate_async(
            [9, 9, 9], SamplingParams(max_tokens=5, top_k=1,
                                      ignore_eos=True)).result(timeout=180)
        assert len(out2.outputs[0].token_ids) == 5
        assert ex.dp_assignments.get(out2.request_id, 0) != 1
    finally:
        if follower.poll() is None:
            follower.kill()
        if llm is not None:
            llm.shutdown()


def test_multiprocess_session_monitors_death(tmp_path):
    """MultiProcessSession reaps a dead worker and fires the callback
    (the proxy.py liveness monitor analog) — exercised with a stub
    worker command."""
    from tensorrt_llm_tpu.executor_orchestration.process_group import (
        MultiProcessSession, WorkerHandle)
    sess = MultiProcessSession("dummy", port=1, role_base="dp")
    deaths = []
    sess.on_death(deaths.append)
    # bypass spawn(): register a short-lived process directly
    proc = subprocess.Popen([sys.executable, "-c", "import sys; sys.exit(3)"])
    sess.workers.append(WorkerHandle(proc, rank=1))
    import threading
    sess._monitor = threading.Thread(target=sess._watch, daemon=True)
    sess._monitor.start()
    deadline = time.monotonic() + 20
    while time.monotonic() < deadline and not deaths:
        time.sleep(0.05)
    sess._stop.set()
    assert deaths and deaths[0].rank == 1
    assert deaths[0].exit_code == 3
