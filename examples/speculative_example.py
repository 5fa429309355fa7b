"""NGram speculative decoding (reference: examples/ngram/)."""
from tensorrt_llm_tpu import LLM, SamplingParams
from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig


def main():
    llm = LLM(model="path/to/hf/checkpoint",
              speculative_config=SpeculativeConfig(mode="NGRAM",
                                                   max_draft_len=4))
    # input-grounded tasks accept many drafts (lossless vs base greedy)
    out = llm.generate("Repeat verbatim: the quick brown fox jumps over "
                       "the lazy dog. The quick",
                       SamplingParams(max_tokens=64, temperature=0.0))
    print(out.outputs[0].text)
    llm.shutdown()


if __name__ == "__main__":
    main()
