"""Multi-host leader/follower execution, actually executed.

Two OS processes run the REAL PyExecutor: the leader schedules and
broadcasts each iteration's SerializableBatch over TCP; the follower
replays it through the identical code path and must produce identical
token streams (reference: executor_request_queue.py:42 rank-0 dequeue +
broadcast; SerializableSchedulerOutput scheduler/scheduler.py:160).
"""
import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    sys.path.insert(0, {repo!r})
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams

    role = sys.argv[1]
    port = int(sys.argv[2])
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    oc = {{"role": role, "port": port, "num_followers": 1}}
    mixed = int(os.environ.get("TEST_MIXED_CTX", "0"))
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=8, max_input_len=64, max_seq_len=160,
              max_num_tokens=256, decode_multi_step=4,
              mixed_window_ctx=mixed,
              orchestrator_config=oc,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    if role == "leader":
        sps = [SamplingParams(max_tokens=20, top_k=1),
               SamplingParams(max_tokens=15, temperature=0.8, top_k=0,
                              top_p=0.9, seed=77),
               SamplingParams(max_tokens=12, top_k=1)]
        prompts = [[1, 2, 3, 4], [9, 8, 7], [40] * 12]
        if mixed:
            # stagger: decode rows live while long prompts arrive, so
            # context chunks ride inside the decode windows
            import time as _time
            futs = [llm.generate_async(prompts[0], sps[0])]
            _time.sleep(0.5)
            futs += [llm.generate_async((i % 96 + 1,) * 48
                                        if i else prompts[1], sps[1 + (i > 0)])
                     for i in range(2)]
            sps = sps[:len(futs)]
        else:
            futs = [llm.generate_async(p, sp) for p, sp in zip(prompts, sps)]
        outs = [f.result(timeout=560) for f in futs]
        result = {{o.request_id: o.outputs[0].token_ids for o in outs}}
        mw = getattr(llm.engine, "mixed_windows_dispatched", 0)
        llm.shutdown()
        print("MIXED " + str(mw), flush=True)
        print("RESULT " + json.dumps(result), flush=True)
    else:
        # follower loop ends when the leader broadcasts shutdown
        ex = llm.executor
        ex._thread.join(timeout=560)
        result = {{str(k): v for k, v in ex.completed_tokens.items()}}
        mw = getattr(llm.engine, "mixed_windows_dispatched", 0)
        llm.shutdown()
        print("MIXED " + str(mw), flush=True)
        print("RESULT " + json.dumps(result), flush=True)
""").format(repo=str(REPO))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_leader_follower_identical_tokens():
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    leader = subprocess.Popen(
        [sys.executable, "-u", "-c", _WORKER, "leader", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    follower = subprocess.Popen(
        [sys.executable, "-u", "-c", _WORKER, "follower", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    try:
        lout, lerr = leader.communicate(timeout=900)
        fout, ferr = follower.communicate(timeout=900)
    except subprocess.TimeoutExpired:
        leader.kill()
        follower.kill()
        raise
    assert leader.returncode == 0, f"leader failed:\n{lerr[-3000:]}"
    assert follower.returncode == 0, f"follower failed:\n{ferr[-3000:]}"

    def parse(out, err, who):
        for line in out.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise AssertionError(f"no RESULT from {who}:\n{out}\n{err[-2000:]}")

    l_tokens = parse(lout, lerr, "leader")
    f_tokens = parse(fout, ferr, "follower")
    assert set(l_tokens) == set(f_tokens), \
        f"request sets differ: {sorted(l_tokens)} vs {sorted(f_tokens)}"
    for rid, toks in l_tokens.items():
        assert f_tokens[rid] == toks, \
            f"request {rid}: leader {toks} != follower {f_tokens[rid]}"
    assert len(l_tokens) == 3


def test_mixed_window_carve_plan_replayed():
    """Mixed (ctx-rider) windows under leader/follower: the carve plan
    ships in SerializableBatch.rider_ids and the follower replays the
    windows bit-identically (VERDICT r4 #8)."""
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", TEST_MIXED_CTX="16")
    env.pop("XLA_FLAGS", None)
    leader = subprocess.Popen(
        [sys.executable, "-u", "-c", _WORKER, "leader", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    follower = subprocess.Popen(
        [sys.executable, "-u", "-c", _WORKER, "follower", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    try:
        lout, lerr = leader.communicate(timeout=900)
        fout, ferr = follower.communicate(timeout=900)
    except subprocess.TimeoutExpired:
        leader.kill()
        follower.kill()
        raise
    assert leader.returncode == 0, f"leader failed:\n{lerr[-3000:]}"
    assert follower.returncode == 0, f"follower failed:\n{ferr[-3000:]}"

    def parse(out, err, who, tag="RESULT "):
        for line in out.splitlines():
            if line.startswith(tag):
                return line[len(tag):]
        raise AssertionError(f"no {tag}from {who}:\n{out}\n{err[-2000:]}")

    l_tokens = json.loads(parse(lout, lerr, "leader"))
    f_tokens = json.loads(parse(fout, ferr, "follower"))
    l_mixed = int(parse(lout, lerr, "leader", "MIXED "))
    f_mixed = int(parse(fout, ferr, "follower", "MIXED "))
    assert l_mixed >= 1, "leader never dispatched a mixed window"
    assert f_mixed == l_mixed, \
        f"follower replayed {f_mixed} mixed windows vs leader {l_mixed}"
    assert set(l_tokens) == set(f_tokens)
    for rid, toks in l_tokens.items():
        assert f_tokens[rid] == toks, \
            f"request {rid}: leader {toks} != follower {f_tokens[rid]}"
