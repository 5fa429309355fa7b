"""``tllm-tpu-bench`` CLI (reference: trtllm-bench,
tensorrt_llm/bench/benchmark/throughput.py:315). Thin wrapper over the
repo-root bench harness with dataset-style arguments."""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser("tllm-tpu-bench")
    p.add_argument("--model", default=None,
                   help="HF checkpoint dir (default: TinyLlama-geometry "
                        "random weights)")
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int4"])
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--isl", type=int, default=128)
    p.add_argument("--osl", type=int, default=128)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    os.environ["BENCH_QUANT"] = args.quant
    os.environ["BENCH_BATCH"] = str(args.batch)
    os.environ["BENCH_ISL"] = str(args.isl)
    os.environ["BENCH_OSL"] = str(args.osl)
    if args.tiny:
        os.environ["BENCH_TINY"] = "1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import bench
    bench.main()


if __name__ == "__main__":
    main()
