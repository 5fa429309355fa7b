import os, time
import faulthandler, sys
faulthandler.dump_traceback_later(420, repeat=True, file=sys.stderr)
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
from transformers import LlamaConfig
from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams

cfg = LlamaConfig(vocab_size=256, hidden_size=256, intermediate_size=512,
                  num_hidden_layers=2, num_attention_heads=2,
                  num_key_value_heads=2, head_dim=128,
                  max_position_embeddings=2048)
llm = LLM(model=cfg, skip_tokenizer_init=True, max_batch_size=8,
          max_input_len=256, max_seq_len=512, max_num_tokens=512,
          load_format="dummy", decode_multi_step=4, mixed_window_ctx=64,
          kv_cache_config=KvCacheConfig(tokens_per_block=32))
rng = np.random.default_rng(0)
sp_long = SamplingParams(max_tokens=48, top_k=1, ignore_eos=True)
sp_new = SamplingParams(max_tokens=4, top_k=1, ignore_eos=True)
anchor = llm.generate_async(rng.integers(1, 255, 16).tolist(), sp_long)
futs = []
for i in range(24):
    futs.append(llm.generate_async(rng.integers(1, 255, 96).tolist(), sp_new))
    time.sleep(0.05)
    if getattr(llm.engine, "mixed_windows_dispatched", 0) > 0 and i > 4:
        break
print("mixed dispatched:", getattr(llm.engine, "mixed_windows_dispatched", 0))
anchor.result(600)
for f in futs: f.result(600)
print("ALL OK; mixed:", getattr(llm.engine, "mixed_windows_dispatched", 0))
llm.shutdown()
