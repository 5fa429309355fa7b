"""``tllm-tpu-eval`` CLI (reference: trtllm-eval, tensorrt_llm/evaluate/).

Tasks: ``ppl`` (teacher-forced perplexity on a text file) plus the
registry tasks (gsm8k, mmlu, cnn_dailymail — evaluate/tasks.py), each
reading a local JSONL dataset and gated by the hypothesis-test method
against the reference-accuracy table (evaluate/accuracy_core.py).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    from ..evaluate.tasks import TASK_REGISTRY
    p = argparse.ArgumentParser("tllm-tpu-eval")
    p.add_argument("model")
    p.add_argument("--task", choices=["ppl"] + sorted(TASK_REGISTRY),
                   default="ppl")
    p.add_argument("--data", default=None,
                   help="text file (ppl) or jsonl (tasks); omit for the "
                        "built-in smoke sample")
    p.add_argument("--max_samples", type=int, default=200)
    p.add_argument("--max_tokens", type=int, default=256)
    p.add_argument("--num_shots", type=int, default=0)
    p.add_argument("--reference_accuracy", type=float, default=None,
                   help="override the built-in reference table")
    p.add_argument("--sigma", type=float, default=50.0)
    args = p.parse_args(argv)

    from ..llmapi.llm import LLM

    llm = LLM(model=args.model)
    try:
        if args.task == "ppl":
            if args.data is None:
                raise SystemExit("--data required for ppl")
            text = open(args.data).read()
            ids = llm.tokenizer.encode(text)[:8192]
            from ..evaluate.perplexity import score_token_logprobs
            import math
            lp = score_token_logprobs(llm.model, llm.engine.params, ids)
            ppl = math.exp(-lp.mean())
            print(json.dumps({"task": "ppl",
                              "value": round(float(ppl), 4),
                              "num_tokens": len(ids)}))
            return
        task = TASK_REGISTRY[args.task](
            data_path=args.data, max_samples=args.max_samples,
            num_shots=args.num_shots, max_tokens=args.max_tokens)
        result = task.evaluate(llm)
        score = result.get("accuracy", result.get("rouge_l", 0.0))
        if args.reference_accuracy is not None:
            from ..evaluate.accuracy_core import hypothesis_test_pass
            result["passed"] = hypothesis_test_pass(
                score, args.reference_accuracy, result["num_samples"],
                args.sigma)
        else:
            gate = task.gate(score, result["num_samples"],
                             str(args.model), args.sigma)
            if gate is not None:
                result["passed"] = gate
        print(json.dumps(result))
    finally:
        llm.shutdown()


if __name__ == "__main__":
    main()
