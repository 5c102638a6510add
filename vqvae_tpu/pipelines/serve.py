"""Continuous-batching sampling service.

BASELINE.json's sampling config asks for "cached AR sampling with continuous
batching of in-flight latent grids". For FIXED-size grids (the reference's
8x8 latents) every grid takes exactly H*W decode steps, so the optimal
schedule is lockstep waves: keep a device batch of B slots always full, decode
one wave (all slots finish together — no raggedness is possible when shapes
are uniform), emit results, refill the slots from the queue, repeat. A
mid-grid join could never finish earlier than the next wave boundary, so
lockstep loses nothing and keeps every step a dense (B, ...) computation on
the MXU.

The service wraps the cached decoder (models/pixelcnn_sampler.py) with:
- a request queue (label, n_samples) -> per-request futures,
- slot packing across requests (one wave can serve many small requests),
- optional VQ-VAE decode of the sampled code grids to images.

Throughput scales with B until the per-pixel matmuls saturate the MXU; the
wave latency is independent of request size.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.config import PixelCNNConfig


@dataclass
class SampleRequest:
    label: int
    n_samples: int
    _event: threading.Event = field(default_factory=threading.Event)
    _result: Optional[np.ndarray] = None

    def result(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self._event.wait(timeout):
            raise TimeoutError("sampling request timed out")
        return self._result


class SamplingService:
    """Continuous-batching AR sampler over a fixed device batch of slots."""

    def __init__(
        self,
        cfg: PixelCNNConfig,
        params,
        batch_size: int = 64,
        seed: int = 0,
    ):
        from vqvae_tpu.models.pixelcnn_sampler import CachedPixelCNNSampler

        self.cfg = cfg
        self.batch_size = batch_size
        self._sampler = CachedPixelCNNSampler(cfg, jax.device_put(params))
        self._queue: "queue.Queue[SampleRequest]" = queue.Queue()
        self._rng = jax.random.PRNGKey(seed)
        self._shape = (cfg.img_dim, cfg.img_dim)
        # One lock serializes whole waves (pack + RNG split + decode +
        # distribute): sample() runs waves on caller threads while start()'s
        # background loop also runs them — without it concurrent waves race on
        # self._rng and interleave queue packing. Waves are device-serial
        # anyway (one chip), so the lock costs no throughput.
        self._wave_lock = threading.Lock()

        @jax.jit
        def wave(labels, rng):
            return self._sampler.generate(
                labels, rng, self._shape, batch_size
            )

        self._wave = wave
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # occupancy counters (read by benches/monitoring; guarded by
        # _wave_lock): waves run and request-serving slots across them —
        # occupancy = slots_used / (waves * batch_size)
        self.stats = {"waves": 0, "slots_used": 0}

    # -- synchronous API ------------------------------------------------------

    def sample(self, label: int, n_samples: int) -> np.ndarray:
        """Blocking convenience wrapper: enqueue + run waves until done."""
        req = self.submit(label, n_samples)
        while not req._event.is_set():
            if self.run_wave() == 0:
                # queue drained by a concurrent wave (e.g. the background
                # loop picked the request up) — wait, don't busy-spin
                req._event.wait(0.005)
        return req.result(0)

    def submit(self, label: int, n_samples: int) -> SampleRequest:
        req = SampleRequest(label, n_samples)
        req._remaining = n_samples
        req._chunks: List[np.ndarray] = []
        self._queue.put(req)
        return req

    def run_wave(self) -> int:
        """Pack pending request slots into one wave, decode, distribute results.

        Returns the number of slots actually serving requests this wave.
        Thread-safe: callers may invoke concurrently (sample() on caller
        threads + the start() background loop); waves serialize on _wave_lock.
        """
        with self._wave_lock:
            return self._run_wave_locked()

    def _run_wave_locked(self) -> int:
        # pack slots
        slots: List[Tuple[SampleRequest, int]] = []  # (request, count)
        labels = np.zeros((self.batch_size,), np.int32)
        pending: List[SampleRequest] = []
        used = 0
        while used < self.batch_size:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            take = min(req._remaining, self.batch_size - used)
            labels[used : used + take] = req.label
            slots.append((req, take))
            req._remaining -= take
            if req._remaining > 0:
                pending.append(req)  # still needs more slots next wave
            used += take
        for req in pending:
            self._queue.put(req)
        if used == 0:
            return 0

        self._rng, sub = jax.random.split(self._rng)
        grids = np.asarray(self._wave(jnp.asarray(labels), sub))

        offset = 0
        for req, take in slots:
            req._chunks.append(grids[offset : offset + take])
            offset += take
            if req._remaining == 0:
                req._result = np.concatenate(req._chunks)
                req._event.set()
        self.stats["waves"] += 1
        self.stats["slots_used"] += used
        return used

    # -- background serving ---------------------------------------------------

    def start(self) -> None:
        """Run waves on a background thread whenever requests are pending."""
        if self._thread is not None:
            return

        def loop():
            while not self._stop.is_set():
                if self._queue.empty():
                    self._stop.wait(0.005)
                    continue
                self.run_wave()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None


class SamplingHTTPServer:
    """Minimal stdlib HTTP front-end over :class:`SamplingService`.

    The production-serving surface the reference lacks entirely (its sampling
    lives in a notebook cell — visualization.ipynb cell 13). JSON API:

    - ``GET /healthz`` -> ``{"ok": true, "pending": N}``
    - ``POST /sample`` with ``{"label": int, "n_samples": int,
      "decode": bool, "image_format": "b64_u8"|"list"}`` ->
      ``{"codes": [[...]], ...}`` plus, when a VQ-VAE decoder is attached and
      ``decode`` is true, the decoded images: by default base64-encoded raw
      uint8 NHWC bytes (``images_b64``/``images_shape``/``images_dtype``;
      [-1,1] floats mapped to [0,255] via (x+1)*127.5 — ~15x smaller and
      ~50x cheaper to serialize than JSON float lists, which dominated
      end-to-end latency on the serving bench), or ``"list"`` for the
      float nested-list format.

    One device, many clients: requests from concurrent connections are packed
    into the same lockstep waves by the service's background thread, so
    serving stays a dense (B, ...) computation regardless of request mix.
    """

    def __init__(
        self,
        service: SamplingService,
        decode_fn=None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        import http.server
        import json

        svc = service

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"ok": True, "pending": svc._queue.qsize()})
                else:
                    self._send(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path != "/sample":
                    self._send(404, {"error": "unknown path"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    label = int(req.get("label", 0))
                    count = int(req.get("n_samples", 1))
                    if not (0 < count <= 4096):
                        raise ValueError("n_samples out of range")
                    fmt = req.get("image_format", "b64_u8")
                    if fmt not in ("b64_u8", "list"):
                        raise ValueError(f"unknown image_format {fmt!r}")
                    codes = svc.submit(label, count).result(timeout=600)
                    out = {"label": label, "codes": codes.tolist()}
                    if decode_fn is not None and req.get("decode", False):
                        imgs = np.asarray(decode_fn(codes))
                        if fmt == "list":
                            out["images"] = imgs.tolist()
                        else:
                            import base64

                            u8 = np.clip(
                                (imgs + 1.0) * 127.5, 0.0, 255.0
                            ).astype(np.uint8)
                            out["images_b64"] = base64.b64encode(
                                u8.tobytes()
                            ).decode("ascii")
                            out["images_shape"] = list(u8.shape)
                            out["images_dtype"] = "uint8"
                    self._send(200, out)
                except Exception as e:  # surface errors to the client
                    self._send(400, {"error": str(e)})

        import socketserver

        class _Server(socketserver.ThreadingMixIn, http.server.HTTPServer):
            daemon_threads = True

        self._httpd = _Server((host, port), Handler)
        self.address = self._httpd.server_address

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def start_background(self) -> None:
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        self._thread = t

    def shutdown(self) -> None:
        self._httpd.shutdown()


__all__ = ["SamplingService", "SampleRequest", "SamplingHTTPServer"]
