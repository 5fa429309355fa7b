"""``tllm-tpu-eval`` CLI (reference: trtllm-eval, tensorrt_llm/evaluate/).

Tasks: ``ppl`` (teacher-forced perplexity on a text file) and ``gsm8k``
(exact-match on a local jsonl with {question, answer}). Accuracy gating
uses the hypothesis-test method (evaluate/accuracy_core.py).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser("tllm-tpu-eval")
    p.add_argument("model")
    p.add_argument("--task", choices=["ppl", "gsm8k"], default="ppl")
    p.add_argument("--data", required=True,
                   help="text file (ppl) or jsonl (gsm8k)")
    p.add_argument("--max_samples", type=int, default=200)
    p.add_argument("--max_tokens", type=int, default=256)
    p.add_argument("--reference_accuracy", type=float, default=None)
    p.add_argument("--sigma", type=float, default=50.0)
    args = p.parse_args(argv)

    from ..llmapi.llm import LLM
    from ..sampling_params import SamplingParams

    llm = LLM(model=args.model)
    if args.task == "ppl":
        text = open(args.data).read()
        ids = llm.tokenizer.encode(text)[:8192]
        from ..evaluate.perplexity import score_token_logprobs
        import math
        lp = score_token_logprobs(llm.model, llm.engine.params, ids)
        ppl = math.exp(-lp.mean())
        print(json.dumps({"task": "ppl", "value": round(float(ppl), 4),
                          "num_tokens": len(ids)}))
    else:
        import re
        correct = total = 0
        rows = [json.loads(l) for l in open(args.data)][:args.max_samples]
        sp = SamplingParams(max_tokens=args.max_tokens, temperature=0.0)
        outs = llm.generate([r["question"] for r in rows], sp)
        for row, out in zip(rows, outs):
            m = re.findall(r"-?\d+\.?\d*", out.outputs[0].text)
            gold = re.findall(r"-?\d+\.?\d*", str(row["answer"]))
            total += 1
            if m and gold and m[-1] == gold[-1]:
                correct += 1
        acc = 100.0 * correct / max(total, 1)
        result = {"task": "gsm8k", "accuracy": round(acc, 2),
                  "num_samples": total}
        if args.reference_accuracy is not None:
            from ..evaluate.accuracy_core import hypothesis_test_pass
            result["passed"] = hypothesis_test_pass(
                acc, args.reference_accuracy, total, args.sigma)
        print(json.dumps(result))
    llm.shutdown()


if __name__ == "__main__":
    main()
