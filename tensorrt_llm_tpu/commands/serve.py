"""``tllm-tpu-serve`` CLI (reference: tensorrt_llm/commands/serve.py)."""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("tllm-tpu-serve")
    p.add_argument("model", help="HF checkpoint directory")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch_size", type=int, default=64)
    p.add_argument("--max_num_tokens", type=int, default=4096)
    p.add_argument("--max_input_len", type=int, default=4096)
    p.add_argument("--max_seq_len", type=int, default=None)
    p.add_argument("--tp_size", type=int, default=1)
    p.add_argument("--dtype", default="auto")
    p.add_argument("--extra_llm_api_options", default=None,
                   help="YAML overlay file (reference semantics)")
    p.add_argument("--grpc", action="store_true",
                   help="serve the binary gRPC frontend instead of HTTP "
                        "(reference: serve.py --grpc)")
    args = p.parse_args(argv)

    from ..llmapi.llm import LLM
    from ..llmapi.llm_args import update_llm_args_with_extra_options

    kwargs = dict(max_batch_size=args.max_batch_size,
                  max_num_tokens=args.max_num_tokens,
                  max_input_len=args.max_input_len,
                  max_seq_len=args.max_seq_len,
                  tensor_parallel_size=args.tp_size,
                  dtype=args.dtype)
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    if args.extra_llm_api_options:
        kwargs = update_llm_args_with_extra_options(
            kwargs, args.extra_llm_api_options)
    llm = LLM(model=args.model, **kwargs)
    if args.grpc:
        from ..grpc import GrpcServer
        GrpcServer(llm, model_name=args.model).run(args.host, args.port)
    else:
        from ..serve.openai_server import OpenAIServer
        OpenAIServer(llm, model_name=args.model).run(args.host, args.port)


if __name__ == "__main__":
    main()
