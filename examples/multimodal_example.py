"""LLaVA-style vision-language generation (reference:
examples/multimodal/): images ride `multi_modal_data`; the CLIP tower
+ projector run as their own jitted program, the image hash salts
KV-prefix reuse so identical text around different images never shares
cache blocks."""
import numpy as np

from tensorrt_llm_tpu import LLM, SamplingParams


def main():
    llm = LLM(model="path/to/llava-1.5-checkpoint")
    image = np.asarray(...)          # [3, H, W] float, preprocessed

    out = llm.generate(
        {"prompt": "USER: <image>\nWhat is shown? ASSISTANT:",
         "multi_modal_data": {"image": [image]}},
        SamplingParams(max_tokens=64))
    print(out.outputs[0].text)
    llm.shutdown()


if __name__ == "__main__":
    main()
