"""Guided decoding: JSON schema / regex constrained outputs
(reference: examples/llm-api/llm_guided_decoding.py)."""
from tensorrt_llm_tpu import (LLM, GuidedDecodingParams, SamplingParams)


def main():
    llm = LLM(model="path/to/hf/checkpoint",
              guided_decoding_backend="dfa")

    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    out = llm.generate(
        "Give me a JSON object describing Alan Turing:",
        SamplingParams(max_tokens=64,
                       guided_decoding=GuidedDecodingParams(json=schema)))
    print(out.outputs[0].text)   # guaranteed to match the schema

    out = llm.generate(
        "A phone number:",
        SamplingParams(max_tokens=16,
                       guided_decoding=GuidedDecodingParams(
                           regex="\\(\\d{3}\\) \\d{3}-\\d{4}")))
    print(out.outputs[0].text)
    llm.shutdown()


if __name__ == "__main__":
    main()
