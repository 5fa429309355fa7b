"""``tllm-tpu-serve-disagg`` CLI — start the disaggregated front door
over an existing ctx/gen worker fleet (reference:
tensorrt_llm/commands/serve.py `disaggregated` subcommand +
serve/openai_disagg_server.py launch path).

Config YAML:

    hostname: 0.0.0.0
    port: 8000
    context_servers:
      urls: ["127.0.0.1:8001"]
      router: {type: round_robin}
    generation_servers:
      urls: ["127.0.0.1:8101"]
      router: {type: kv_cache_aware, tokens_per_block: 32}
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("tllm-tpu-serve-disagg")
    p.add_argument("-c", "--config", required=True,
                   help="disagg cluster YAML")
    p.add_argument("--host", default=None)
    p.add_argument("--port", type=int, default=None)
    args = p.parse_args(argv)

    import yaml
    with open(args.config) as f:
        cfg = yaml.safe_load(f) or {}

    from ..serve.openai_disagg_server import build_disagg_server_from_config
    server = build_disagg_server_from_config(cfg)
    server.run(host=args.host or cfg.get("hostname", "0.0.0.0"),
               port=args.port or int(cfg.get("port", 8000)))


if __name__ == "__main__":
    main()
