"""``tllm-tpu-build`` — ahead-of-time engine build.

Analog of ``trtllm-build`` (reference: tensorrt_llm/commands/build.py →
builder.py:974): on TPU the "engine" is the set of bucketed XLA
executables, so building = loading the model, compiling every token
bucket, and persisting the compilation cache. A later ``LLM()`` /
``tllm-tpu-serve`` with the same cache directory starts without any
compile stalls.
"""
from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser("tllm-tpu-build")
    p.add_argument("model", help="HF checkpoint directory")
    p.add_argument("--cache_dir",
                   default=os.path.expanduser("~/.cache/tllm_tpu_engine"))
    p.add_argument("--max_batch_size", type=int, default=64)
    p.add_argument("--max_num_tokens", type=int, default=4096)
    p.add_argument("--max_input_len", type=int, default=4096)
    p.add_argument("--max_seq_len", type=int, default=None)
    p.add_argument("--tp_size", type=int, default=1)
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int4", "fp8"])
    p.add_argument("--load_format", default="auto",
                   choices=["auto", "dummy"])
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..llmapi.llm import LLM
    from ..llmapi.llm_args import QuantConfig
    from ..quantization.mode import QuantAlgo

    qc = {"none": QuantConfig(),
          "int8": QuantConfig(quant_algo=QuantAlgo.W8A16),
          "int4": QuantConfig(quant_algo=QuantAlgo.W4A16_AWQ),
          "fp8": QuantConfig(quant_algo=QuantAlgo.FP8)}[args.quant]
    t0 = time.monotonic()
    llm = LLM(model=args.model, max_batch_size=args.max_batch_size,
              max_num_tokens=args.max_num_tokens,
              max_input_len=args.max_input_len,
              max_seq_len=args.max_seq_len,
              tensor_parallel_size=args.tp_size,
              quant_config=qc, load_format=args.load_format)
    if jax.default_backend() != "tpu":
        llm.engine.warmup()  # LLM only auto-warms on TPU
    print(f"engine built: {len(llm.engine.token_buckets)} buckets "
          f"compiled and cached under {args.cache_dir} "
          f"in {time.monotonic() - t0:.1f}s")
    llm.shutdown()


if __name__ == "__main__":
    main()
