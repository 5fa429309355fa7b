"""Attention-DP process groups, actually executed: a dp_leader routes
requests across 2 ranks via the ADP Balance router (request.dp_rank is
CONSUMED — each rank executes only its partition), followers stream
results back over the same socket (reference:
scheduler/adp_router.py:259 + AttentionDpConfig)."""
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
    oc = {{"role": role, "port": port, "num_followers": 1, "dp_rank": 1}}
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=8, max_input_len=64, max_seq_len=160,
              max_num_tokens=256, orchestrator_config=oc,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    if role == "dp_leader":
        sps = [SamplingParams(max_tokens=10 + i, top_k=1)
               for i in range(6)]
        prompts = [[i + 1, i + 2, i + 3, i + 4] for i in range(6)]
        futs = [llm.generate_async(p, sp) for p, sp in zip(prompts, sps)]
        outs = [f.result(timeout=560) for f in futs]
        ex = llm.executor
        result = {{
            "tokens": {{o.request_id: o.outputs[0].token_ids
                        for o in outs}},
            "assignments": dict(ex.dp_assignments),
            "leader_executed": sorted(ex.completed_tokens)
                if ex.completed_tokens else sorted(
                    ex.dp_assignments),
        }}
        # which requests did the leader itself run? those it admitted
        result["leader_ran"] = [rid for rid, r in
                                ex.dp_assignments.items() if r == 0]
        llm.shutdown()
        print("RESULT " + json.dumps(result), flush=True)
    else:
        ex = llm.executor
        ex._thread.join(timeout=560)
        result = {{str(k): v for k, v in ex.completed_tokens.items()}}
        llm.shutdown()
        print("RESULT " + json.dumps(result), flush=True)
""").format(repo=str(REPO))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _parse(out):
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in: {out[-2000:]}")


def test_two_process_dp_group_routes_and_returns():
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    leader = subprocess.Popen(
        [sys.executable, "-u", "-c", _WORKER, "dp_leader", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    follower = subprocess.Popen(
        [sys.executable, "-u", "-c", _WORKER, "dp_follower", str(port)],
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
    lres = _parse(lout)
    fres = _parse(fout)

    tokens = {int(k): v for k, v in lres["tokens"].items()}
    assigns = {int(k): v for k, v in lres["assignments"].items()}
    follower_ran = {int(k): v for k, v in fres.items()}

    # all 6 requests completed with the requested lengths
    assert len(tokens) == 6
    for rid, toks in tokens.items():
        assert len(toks) >= 1

    # the router actually balanced: both ranks got work
    assert set(assigns.values()) == {0, 1}, assigns
    # per-rank execution tracks the router's assignment exactly
    for rid, rank in assigns.items():
        if rank == 1:
            assert rid in follower_ran, (rid, follower_ran)
            # and the tokens the leader served came from that rank
            assert tokens[rid] == follower_ran[rid]
        else:
            assert rid not in follower_ran
