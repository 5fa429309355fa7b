"""``tllm-tpu-launch`` — multi-process worker launcher.

Role analog of ``trtllm-llmapi-launch`` (reference: setup.py:417-426
entry point + llmapi/mpi_session.py): one command starts a worker
process in a leader/follower (or dp_leader/dp_follower) group. The
leader case also spawns its followers locally when ``--num-workers``
is given (single-host multi-process; multi-host deployments start one
launch per host pointing at the leader's host:port).

Examples:
  # 1 leader + 3 local dp followers serving one model
  tllm-tpu-launch --role dp_leader --num-workers 4 --port 5311 \
      --model /ckpt/llama
  # a follower on another host
  tllm-tpu-launch --role dp_follower --host leader-host --port 5311 \
      --dp-rank 2 --model /ckpt/llama
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser():
    p = argparse.ArgumentParser("tllm-tpu-launch")
    p.add_argument("--role", required=True,
                   choices=["leader", "follower", "dp_leader",
                            "dp_follower"])
    p.add_argument("--model", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--num-workers", type=int, default=1,
                   help="leader: total ranks; spawns num-workers-1 "
                        "local follower processes")
    p.add_argument("--dp-rank", type=int, default=1)
    p.add_argument("--llm-args", default="{}",
                   help="JSON dict of extra LLM kwargs")
    p.add_argument("--max-batch-size", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from tensorrt_llm_tpu import LLM

    llm_kwargs = json.loads(args.llm_args)
    if args.max_batch_size:
        llm_kwargs["max_batch_size"] = args.max_batch_size
    oc = {"role": args.role, "port": args.port, "host": args.host,
          "num_followers": max(1, args.num_workers - 1),
          "dp_rank": args.dp_rank}

    session = None
    if args.role in ("leader", "dp_leader") and args.num_workers > 1:
        from ..executor_orchestration.process_group import \
            MultiProcessSession
        session = MultiProcessSession(
            args.model, args.port,
            role_base="dp" if args.role == "dp_leader" else "",
            extra_args={"llm-args": args.llm_args} if llm_kwargs else {})
        # spawn BEFORE the leader binds: followers retry-connect while
        # the leader builds its engine
        session.spawn(args.num_workers - 1)

    llm = LLM(model=args.model, orchestrator_config=oc, **llm_kwargs)
    try:
        if args.role in ("leader", "dp_leader"):
            # leader process: serve the OpenAI API on top of the group
            from ..serve.openai_server import OpenAIServer
            server = OpenAIServer(llm)
            server.run()
        else:
            # follower: run until the leader broadcasts shutdown
            llm.executor._thread.join()
    finally:
        llm.shutdown()
        if session is not None:
            session.shutdown()


if __name__ == "__main__":
    sys.exit(main())
