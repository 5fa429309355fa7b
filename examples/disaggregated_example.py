"""Disaggregated serving: a context engine prefills and ships KV; a
generation engine continues decoding
(reference: examples/disaggregated/)."""
from tensorrt_llm_tpu import LLM, SamplingParams
from tensorrt_llm_tpu.disaggregation import DisaggregatedParams


def main():
    # both engines share the in-process KV transport here; across hosts,
    # wire disaggregation.transceiver.TcpKvTransport instead
    ctx_llm = LLM(model="path/to/hf/checkpoint")
    gen_llm = LLM(model="path/to/hf/checkpoint")

    prompt = "Summarize the history of the transistor:"
    ctx_out = ctx_llm.generate_async(
        prompt, SamplingParams(max_tokens=1),
        disaggregated_params=DisaggregatedParams(
            request_type="context_only")).result()
    first = ctx_out.outputs[0].token_ids

    gen_out = gen_llm.generate_async(
        ctx_out.prompt_token_ids, SamplingParams(max_tokens=128),
        disaggregated_params=DisaggregatedParams(
            request_type="generation_only",
            ctx_request_id=ctx_out.request_id,
            first_gen_tokens=first)).result()
    print(gen_out.outputs[0].text)
    ctx_llm.shutdown()
    gen_llm.shutdown()


if __name__ == "__main__":
    main()
