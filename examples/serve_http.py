"""Minimal HTTP text-generation server on the continuous batcher.

POST /generate  {"prompt": "...", "max_new": 32,
                 "temperature": 0.8, "top_k": 40, "top_p": 0.95,
                 "seed": 1, "adapter": 0}          ->  {"text": "..."}
GET  /stats     ->  {"running": n, "queued": n, "free_slots": n}

Sampling keys are optional (defaults greedy); `adapter` selects a LoRA
adapter registered on the batcher (`register_adapter`; 0 = base model),
so one server can front many fine-tunes of the same base weights.

One background thread drives `ContinuousBatcher.step()` continuously;
HTTP handlers only enqueue requests and wait on their completion event,
so concurrent requests from different clients share decode batches
(mid-flight admission — a new prompt joins the next step, it never
waits for the batch to drain). Stdlib only (http.server + threading).

Run (CPU demo):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/serve_http.py
then:
    curl -s localhost:8777/generate -d '{"prompt": "the sun", "max_new": 16}'
"""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from neuronika_tpu.data import BpeTokenizer
from neuronika_tpu.models import transformer as T
from neuronika_tpu.serving import ContinuousBatcher

PORT = 8777
CORPUS = (
    "the sun rose over the quiet valley and the river kept moving. "
    "a traveler walked the long road toward the distant town. "
) * 50


class Engine:
    """Batcher + driver thread + per-request completion events."""

    def __init__(self):
        self.tok = BpeTokenizer.train([CORPUS], vocab_size=384)
        cfg = T.GPTConfig(vocab_size=self.tok.vocab_size, n_layer=2,
                          n_head=4, d_model=128, d_ff=256, max_seq=128,
                          dtype=jnp.float32)
        params = T.init_params(jax.random.key(0), cfg)
        # quick pre-train so generations echo the corpus (demo weights)
        from neuronika_tpu.data import lm_windows

        toks, tgts = lm_windows(np.array(self.tok.encode(CORPUS)), 64)
        step = T.make_train_step(cfg)
        opt = T.adam_init(params)
        for i in range(30):
            params, opt, _ = step(params, opt, jnp.asarray(toks[:16]),
                                  jnp.asarray(tgts[:16]),
                                  jnp.float32(3e-3), jax.random.key(i))
        self.cb = ContinuousBatcher(params, cfg, n_slots=8)
        self.lock = threading.Lock()
        self.events: dict[int, threading.Event] = {}
        self.results: dict[int, np.ndarray] = {}
        threading.Thread(target=self._drive, daemon=True).start()

    def _drive(self):
        import time

        while True:
            with self.lock:
                running, queued, _ = self.cb.stats
                if running or queued:
                    # per-token stepping keeps finish detection (and so
                    # response latency) tight for an interactive demo;
                    # a throughput deployment would drive step_many(k)
                    # (one host round trip per k tokens) and batch
                    # burst arrivals under cb.defer_admission()
                    self.cb.step()
                    for rid, toks in list(self.cb._finished.items()):
                        ev = self.events.get(rid)
                        if ev is not None and not ev.is_set():
                            self.results[rid] = toks
                            ev.set()
                    busy = True
                else:
                    busy = False
            if not busy:
                time.sleep(0.005)

    def generate(self, prompt: str, max_new: int, **sampling) -> str:
        ids = self.tok.encode(prompt) or [0]
        ev = threading.Event()
        with self.lock:
            rid = self.cb.submit(ids, max_new=max_new, **sampling)
            self.events[rid] = ev
        ev.wait(timeout=120)
        with self.lock:
            out = self.results.pop(rid, np.zeros(0, np.int32))
            self.events.pop(rid, None)
        return self.tok.decode(np.asarray(out).tolist())

    def stats(self):
        with self.lock:
            running, queued, free = self.cb.stats
        return {"running": running, "queued": queued, "free_slots": free}


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stats":
                return self._json(200, engine.stats())
            self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                sampling = {}
                for k, cast in (("temperature", float), ("top_k", int),
                                ("top_p", float), ("min_p", float),
                                ("seed", int), ("adapter", int)):
                    if k in req:
                        sampling[k] = cast(req[k])
                text = engine.generate(str(req.get("prompt", "")),
                                       int(req.get("max_new", 32)),
                                       **sampling)
                self._json(200, {"text": text})
            except Exception as e:  # demo server: report, don't die
                self._json(500, {"error": str(e)})

        def log_message(self, *a):
            pass

    return Handler


def main():
    engine = Engine()
    srv = ThreadingHTTPServer(("127.0.0.1", PORT), make_handler(engine))
    print(f"serving on http://127.0.0.1:{PORT}  (POST /generate, GET /stats)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
