"""Service-level serving benchmark (VERDICT r4 item 8).

The component benches (artifacts/sampler.json) measure the cached decoder
kernel; this measures the PRODUCTION SURFACE: `SamplingService` + the HTTP
front-end under concurrent mixed-size requests, including the decode-to-images
leg — request throughput, p50/p99 latency, and lockstep-wave occupancy.
(The reference's equivalent "serving" is a notebook cell:
/root/reference/visualization.ipynb cell 13.)

Load model: N client threads each issue a stream of POST /sample requests with
n_samples drawn round-robin from a mixed-size schedule; some requests ask for
decoded images. Per-request wall latency is recorded client-side (includes
JSON + HTTP overhead — the honest end-to-end number).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np


def _percentile(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def run_bench(
    wave_batch: int,
    n_clients: int,
    requests_per_client: int,
    mixed_sizes,
    decode_every: int,
    prior_layers: int,
    image_format: str = "b64_u8",
) -> dict:
    import jax

    from vqvae_tpu.config import PixelCNNConfig, VQVAEConfig
    from vqvae_tpu.models.pixelcnn import GatedPixelCNN
    from vqvae_tpu.models.vqvae import VQVAE
    from vqvae_tpu.pipelines.serve import SamplingHTTPServer, SamplingService
    import jax.numpy as jnp

    cfg = PixelCNNConfig(n_layers=prior_layers)
    model = GatedPixelCNN(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, cfg.img_dim, cfg.img_dim), jnp.int32),
        jnp.zeros((2,), jnp.int32),
    )["params"]

    # decode-to-images leg: a real VQ-VAE decoder (fresh init — serving cost
    # is weight-independent), codes -> codebook lookup -> decoder image
    vq_cfg = VQVAEConfig()
    vq = VQVAE(vq_cfg)
    vq_params = vq.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )["params"]

    @jax.jit
    def _decode(codes):
        return vq.apply({"params": vq_params}, codes, method=vq.decode_codes)

    def decode_fn(codes):
        return np.asarray(_decode(jnp.asarray(codes, jnp.int32)))

    service = SamplingService(cfg, params, batch_size=wave_batch)
    service.start()
    server = SamplingHTTPServer(service, decode_fn=decode_fn)
    server.start_background()
    host, port = server.address

    import http.client

    def one_request(conn, label, n, decode, image_format="b64_u8"):
        body = json.dumps(
            {"label": label, "n_samples": n, "decode": decode,
             "image_format": image_format}
        ).encode()
        t0 = time.perf_counter()
        conn.request(
            "POST", "/sample", body, {"Content-Type": "application/json"}
        )
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        dt = time.perf_counter() - t0
        assert resp.status == 200, payload
        assert len(payload["codes"]) == n
        if decode:
            if image_format == "list":
                assert len(payload["images"]) == n
            else:
                assert payload["images_shape"][0] == n
                assert len(payload["images_b64"]) > 0
        return dt

    # -- warmup: compile the wave + decode jits outside the timed window -----
    conn = http.client.HTTPConnection(host, port, timeout=600)
    one_request(conn, 0, 2, True, image_format)
    one_request(conn, 0, wave_batch + 1, False)  # multi-wave path
    conn.close()
    # reset under the wave lock: the background thread increments stats
    # AFTER setting the request event, so an unsynchronized reset could let
    # the last warmup wave's counts land in the fresh dict
    with service._wave_lock:
        service.stats = {"waves": 0, "slots_used": 0}

    lat = []  # (n_samples, decode, seconds)
    lat_lock = threading.Lock()
    errors = []

    def client(cid: int):
        conn = http.client.HTTPConnection(host, port, timeout=600)
        try:
            for r in range(requests_per_client):
                n = mixed_sizes[(cid + r) % len(mixed_sizes)]
                decode = decode_every > 0 and r % decode_every == 0
                dt = one_request(conn, cid % 10, n, decode, image_format)
                with lat_lock:
                    lat.append((n, decode, dt))
        except Exception as e:  # pragma: no cover - surfaced in payload
            errors.append(f"client {cid}: {e!r}")
        finally:
            conn.close()

    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    service.stop()
    server.shutdown()

    assert not errors, errors
    total_grids = sum(n for n, _, _ in lat)
    all_lat = [dt for _, _, dt in lat]
    dec_lat = [dt for _, d, dt in lat if d]
    plain_lat = [dt for _, d, dt in lat if not d]
    waves = service.stats["waves"]
    occupancy = (
        service.stats["slots_used"] / (waves * wave_batch) if waves else 0.0
    )
    return {
        "wave_batch": wave_batch,
        "n_clients": n_clients,
        "requests": len(lat),
        "request_mix_n_samples": list(mixed_sizes),
        "decode_every": decode_every,
        "image_format": image_format,
        "prior_layers": prior_layers,
        "wall_seconds": wall,
        "grids_per_sec": total_grids / wall,
        "requests_per_sec": len(lat) / wall,
        "latency_p50_ms": _percentile(all_lat, 50) * 1e3,
        "latency_p99_ms": _percentile(all_lat, 99) * 1e3,
        "latency_decode_p50_ms": _percentile(dec_lat, 50) * 1e3 if dec_lat else None,
        "latency_plain_p50_ms": _percentile(plain_lat, 50) * 1e3 if plain_lat else None,
        "waves": waves,
        "wave_occupancy": occupancy,
    }


def main() -> int:
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--wave_batch", type=int, default=256)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests_per_client", type=int, default=12)
    ap.add_argument(
        "--sizes", type=int, nargs="*", default=[1, 4, 16, 64, 256],
        help="mixed request sizes, assigned round-robin across clients",
    )
    ap.add_argument("--decode_every", type=int, default=4,
                    help="every k-th request per client also decodes to images")
    ap.add_argument("--prior_layers", type=int, default=15)
    ap.add_argument("--image_format", type=str, default="b64_u8",
                    choices=["b64_u8", "list"])
    ap.add_argument("--out", type=str, default="artifacts/serve_bench.json")
    args = ap.parse_args()

    row = run_bench(
        args.wave_batch, args.clients, args.requests_per_client,
        args.sizes, args.decode_every, args.prior_layers,
        image_format=args.image_format,
    )
    payload = {
        "metric": "SamplingService+HTTP end-to-end under concurrent mixed-size "
                  "requests (continuous lockstep-wave batching; client-side "
                  "latencies include JSON+HTTP overhead)",
        "reference_baseline": "/root/reference/visualization.ipynb cell 13 "
                              "(notebook-cell sampling, no serving surface)",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind),
        "row": row,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(row, indent=2))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
