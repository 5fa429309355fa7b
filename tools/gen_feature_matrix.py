#!/usr/bin/env python
"""Auto-generate docs/feature_support.md from the test suite.

Replaces hand-maintained ✅ marks (reference artifact:
docs/source/features/feature-combination-matrix.md) with derived ones:
each feature maps to the pytest node patterns that prove it; the script
runs the suite once with junit output and marks ✅ only when every
mapped test exists AND passed. Features with no mapped test render ⚙️
(implemented, untested) so gaps stay visible instead of silently green.

Usage: python tools/gen_feature_matrix.py [--skip-run]
(--skip-run reuses /tmp/tllm_tpu_junit.xml from a previous run)
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
JUNIT = Path("/tmp/tllm_tpu_junit.xml")

# feature -> (substring patterns over "file::test" ids, note)
FEATURES = [
    ("Continuous batching + overlap executor", ["test_llm_api"], ""),
    ("Chunked prefill + micro-batch scheduler",
     ["test_scheduler.py::test_micro_batch_token_budget_chunks_context",
      "test_scheduler.py::test_equal_progress_chunking"], ""),
    ("Prefix reuse (radix KV)", ["test_kv_cache_manager"], ""),
    ("Paged KV + native C++ block manager", ["test_native_block_manager"], ""),
    ("KV host-tier offload", ["test_kv_host_tier"], ""),
    ("Multi-step decode windows", ["test_multi_step"], ""),
    ("Sampling (penalties/seeds/top-k/top-p)", ["test_ops"], ""),
    ("Beam search", ["test_beam_search"], ""),
    ("Guided decoding (JSON/regex)", ["test_guided"], ""),
    ("Speculative: NGram", ["test_speculative.py::test_e2e_ngram"], ""),
    ("Speculative: draft/target two-model",
     ["test_speculative.py::test_e2e_draft_target"], ""),
    ("Speculative: lossless sampled acceptance",
     ["test_speculative.py::test_e2e_seeded_sampled",
      "test_speculative.py::test_e2e_unseeded_sampled"], ""),
    ("Quantization (int4/int8/fp8 weight-only, W8A8, KV quant)",
     ["test_models_extra", "test_ops"], ""),
    ("LoRA multi-adapter", ["test_lora"], ""),
    ("Mamba/SSM models", ["test_mamba"], ""),
    ("DeepSeek-V3 MLA + MoE", ["test_deepseek"], ""),
    ("Tensor parallel (GSPMD + shard_map attention)",
     ["test_parallel.py::test_tp"], ""),
    ("Expert parallel MoE", ["test_parallel.py::test_moe_ep",
                             "test_parallel.py::test_mixtral_ep"], ""),
    ("Ulysses context parallel", ["test_parallel.py::test_ulysses"], ""),
    ("True pipeline parallel (GPipe + ppermute)",
     ["test_parallel.py::test_true_pp"], ""),
    ("Multi-host leader/follower execution", ["test_multihost"], ""),
    ("Disaggregated ctx/gen serving", ["test_disaggregation"], ""),
    ("OpenAI server", ["test_server"], ""),
    ("Scheduler policies + pause/evict", ["test_scheduler",
                                          "test_pause_evict"], ""),
    ("Evaluation harness (ppl + tasks + gates)", ["test_evaluate"], ""),
    ("Scaffolding (best-of-N, majority vote)", ["test_scaffolding"], ""),
    ("Orchestration / broadcast serialization", ["test_orchestration"], ""),
    ("Model zoo parity vs HF", ["test_models"], ""),
    ("Multimodal prompt embeddings", ["test_misc_features"], ""),
    ("Speculative: EAGLE3 one-model head",
     ["test_speculative.py::test_e2e_eagle3"], ""),
    ("Disagg router + OpenAI front door", ["test_disagg_server"], ""),
    ("gRPC frontend", ["test_grpc"], ""),
    ("KV connector API (external stores)", ["test_kv_connector"], ""),
    ("Usage telemetry (opt-out, schema-validated)", ["test_usage"], ""),
    ("Scheduler v2 (waiting queue + ADP router)",
     ["test_scheduler_v2"], ""),
    ("Guided decoding: EBNF grammars", ["test_guided.py::test_ebnf"], ""),
    ("Guided decoding: structural tags",
     ["test_guided.py::test_structural"], ""),
    ("Tool-call parsers + /v1/responses",
     ["test_tool_parser", "test_server.py::test_responses"], ""),
    ("SmoothQuant (calibrated smoothing)", ["test_smoothquant"], ""),
    ("Postprocess worker pool", [
        "test_misc_features.py::test_postprocess_workers"], ""),
    ("Determinism (golden seeded tokens)", ["test_determinism"], ""),
    ("DWDP (dp-sharded weights)",
     ["test_parallel.py::test_dwdp"], ""),
    ("VSWA (per-window KV pools)", ["test_vswa"], ""),
    ("Vision encoders + LLaVA (mm-hash reuse)", ["test_multimodal"], ""),
    ("Ragged prefill attention kernel (hd%64)",
     ["test_prefill_kernel"], ""),
    ("Sharded/lazy checkpoint loading",
     ["test_misc_features.py::test_sharded_checkpoint"], ""),
    ("Speculative: DeepSeek-V3 MTP module",
     ["test_speculative.py::test_e2e_mtp", "test_speculative.py::"
      "test_mtp_drafter_unit"], ""),
    ("Mamba2 (SSD) models", ["test_mamba2"], ""),
    ("Hybrid SSM+attention (Jamba/Bamba/Zamba2/Granite-4.0)",
     ["test_jamba", "test_bamba", "test_hybrid_models"], ""),
    ("GPT-OSS (attention sinks + clamped-SwiGLU MoE)",
     ["test_gpt_oss"], ""),
    ("Qwen2-VL / Qwen2.5-VL (M-RoPE)", ["test_qwen2_vl"], ""),
    ("Gemma3-VL (bidirectional image spans)", ["test_gemma3_vl"], ""),
    ("LLaVA-Next anyres + Mistral3/Pixtral",
     ["test_multimodal.py::test_llava_next",
      "test_multimodal.py::test_mistral3"], ""),
    ("Qwen3-Next (gated DeltaNet linear attention)",
     ["test_qwen3_next"], ""),
    ("BERT encoder path (LLM.classify)", ["test_bert"], ""),
    ("Tree-draft speculation (ancestry verify + KV compaction)",
     ["test_tree_spec"], ""),
]


def run_suite() -> None:
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q",
         f"--junitxml={JUNIT}"],
        cwd=REPO, env=env, check=False, timeout=1800)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-run", action="store_true")
    args = ap.parse_args()
    if not args.skip_run or not JUNIT.exists():
        run_suite()
    tree = ET.parse(JUNIT)
    results = {}
    for tc in tree.iter("testcase"):
        tid = f"{tc.get('classname', '')}::{tc.get('name', '')}"
        failed = tc.find("failure") is not None or \
            tc.find("error") is not None
        results[tid] = not failed
    lines = [
        "# Feature support (auto-generated)",
        "",
        "Generated by `tools/gen_feature_matrix.py` from the live test",
        "suite — ✅ means every mapped test passed in the last run;",
        "❌ means a mapped test failed; ⚙️ means no test evidence.",
        f"Suite: {sum(results.values())}/{len(results)} tests passing.",
        "",
        "| Feature | Status | Test evidence |",
        "|---|---|---|",
    ]
    for name, patterns, note in FEATURES:
        # a pattern hits if all its '::' parts appear in the test id
        matched = {}
        for t, ok in results.items():
            for p in patterns:
                parts = p.replace(".py", "").split("::")
                if all(part in t for part in parts):
                    matched[t] = ok
        if not matched:
            status = "⚙️"
            evidence = "(none)"
        elif all(matched.values()):
            status = "✅"
            evidence = f"{len(matched)} tests"
        else:
            status = "❌"
            evidence = ", ".join(t for t, ok in matched.items()
                                 if not ok)[:80]
        suffix = f" — {note}" if note else ""
        lines.append(f"| {name}{suffix} | {status} | {evidence} |")
    out = REPO / "docs" / "feature_support.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    for line in lines[7:]:
        print(line)


if __name__ == "__main__":
    main()
