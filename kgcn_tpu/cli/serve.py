"""``kgcn-tpu-serve`` — HTTP inference server.

A dependency-free (stdlib ``http.server``) JSON API over the serving runtime
(kgcn_tpu/runtime/serve.py).  The reference had no serving path at all — its
KNIME GCNPredictor node spawned one ``kgcn infer`` process per prediction
(KNIME/GCN-K GCNPredictorNodeModel); here the model stays resident and
compiled across requests.

Endpoints:
  GET  /healthz   → {"status": "ok", "ready": …, "requests": …}
  POST /predict   → body: jbl-schema JSON ({"feature": [...], "adj": …} or
                    {"dense_adj": …}); response: {"prediction": …,
                    "num": …, "latency_ms": …}
"""
from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(predictor):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path in ("/healthz", "/health", "/"):
                self._send(200, predictor.health())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                self._send(200, predictor.predict(payload))
            except FileNotFoundError as e:
                self._send(503, {"error": f"checkpoint not found: {e}"})
            except Exception as e:  # surface the failure to the client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            print(f"[serve] {self.address_string()} {fmt % args}")

    return Handler


def build_server(config: dict, *, host: str = "0.0.0.0", port: int = 8901,
                 checkpoint: str | None = None, export: str | None = None,
                 dynamic_batching: bool = False, window_ms: float = 5.0,
                 max_graphs: int = 256):
    """Construct (server, predictor) without blocking — used by tests."""
    from kgcn_tpu.runtime.serve import (
        DynamicBatcher,
        ExportPredictor,
        Predictor,
    )

    predictor = (
        ExportPredictor(export, config)
        if export
        else Predictor(config, checkpoint=checkpoint)
    )
    if dynamic_batching and not export:
        predictor = DynamicBatcher(
            predictor, window_ms=window_ms, max_graphs=max_graphs
        )
    server = ThreadingHTTPServer((host, port), make_handler(predictor))
    return server, predictor


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="kgcn-tpu inference server")
    p.add_argument("--config", required=True, help="training config JSON")
    p.add_argument("--checkpoint", default=None, help="checkpoint override")
    p.add_argument("--export", default=None,
                   help="serve a jax.export artifact instead of a checkpoint")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8901)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--dynamic-batching", action="store_true",
                   help="coalesce concurrent requests into one device call")
    p.add_argument("--batch-window-ms", type=float, default=5.0)
    p.add_argument("--max-batch-graphs", type=int, default=256)
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    with open(args.config) as f:
        config = json.load(f)
    server, predictor = build_server(
        config, host=args.host, port=args.port,
        checkpoint=args.checkpoint, export=args.export,
        dynamic_batching=args.dynamic_batching,
        window_ms=args.batch_window_ms, max_graphs=args.max_batch_graphs,
    )
    print(f"[serve] listening on {args.host}:{args.port} "
          f"(model={config.get('model.py', 'gcn')})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
