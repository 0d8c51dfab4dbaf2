"""Serve an exported AOT bundle over HTTP (stdlib only).

Usage:
    python scripts/serve_http.py --bundle aum-base.aum.zip [--port 8000]

Endpoints: GET /healthz, POST /predict {"instances": [...], "topk": 5}.
See aum_tpu.serving.make_http_server for the contract.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bundle", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args()

    from aum_tpu.serving import load_bundle, make_http_server

    sm = load_bundle(args.bundle)
    print(f"serving {args.bundle} on {args.host}:{args.port} "
          f"(batch sizes {sm.batch_sizes}, "
          f"frontend={'wav' if sm.manifest['include_frontend'] else 'fbank'})")
    make_http_server(sm, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
