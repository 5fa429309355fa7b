"""Quickstart: sync, async, and streaming generation
(reference: examples/llm-api/quickstart_example.py)."""
from tensorrt_llm_tpu import LLM, SamplingParams


def main():
    llm = LLM(model="path/to/hf/checkpoint")

    # sync batch
    prompts = ["The capital of France is",
               "The future of AI is"]
    for out in llm.generate(prompts, SamplingParams(max_tokens=32)):
        print(f"{out.prompt!r} -> {out.outputs[0].text!r}")

    # async + streaming
    fut = llm.generate_async("Write a haiku about TPUs",
                             SamplingParams(max_tokens=48, temperature=0.8),
                             streaming=True)
    for delta in fut:
        print(delta.text, end="", flush=True)
    print()
    llm.shutdown()


if __name__ == "__main__":
    main()
