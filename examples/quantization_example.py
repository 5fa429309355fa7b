"""Weight-only quantized serving (reference: examples/quantization/)."""
from tensorrt_llm_tpu import LLM, QuantConfig, SamplingParams
from tensorrt_llm_tpu.quantization.mode import KvCacheQuantAlgo, QuantAlgo


def main():
    llm = LLM(
        model="path/to/hf/checkpoint",
        quant_config=QuantConfig(
            quant_algo=QuantAlgo.W4A16_AWQ,       # int4 group-128 weights
            kv_cache_quant_algo=KvCacheQuantAlgo.INT8,
            group_size=128),
    )
    out = llm.generate("Explain KV-cache paging in one sentence.",
                       SamplingParams(max_tokens=64))
    print(out.outputs[0].text)
    llm.shutdown()


if __name__ == "__main__":
    main()
