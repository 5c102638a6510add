"""Measure and PIN the torch-CPU reference encode+quantize baseline.

bench.py's vs_baseline ratio used to live-measure the reference on every run;
on a loaded 2-core host that swung the ratio 1398 -> 849 between rounds on
identical code (VERDICT r2 weak-item 6). This tool measures once — on an
otherwise-quiet host — and records the number plus methodology in
artifacts/torch_cpu_baseline.json; bench.py then reads the pin.

Methodology: the reference's own Encoder + 1x1 pre-quant conv + VectorQuantizer
(imported read-only from /root/reference), eval mode, no_grad, batch 64,
best-of-R timing over enough iterations to amortize; best-of is the right
statistic for a pin (least-loaded snapshot of the machine = the fairest
number for the reference).
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

sys.path.insert(0, "/root/reference")


def measure(batch: int, iters: int, repeats: int) -> dict:
    import torch

    from models.encoder import Encoder as TEncoder  # reference, read-only
    from models.quantizer import VectorQuantizer as TQuantizer

    torch.manual_seed(0)
    enc = TEncoder(3, 128, 2, 32).eval()
    pre = torch.nn.Conv2d(128, 64, 1)
    quant = TQuantizer(512, 64, 0.25).eval()
    x = torch.randn(batch, 3, 32, 32)
    best = float("inf")
    with torch.no_grad():
        for _ in range(3):  # warmup
            quant(pre(enc(x)))
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                quant(pre(enc(x)))
            best = min(best, (time.perf_counter() - t0) / iters)
    return {
        "images_per_sec": batch / best,
        "batch": batch,
        "iters_per_repeat": iters,
        "repeats": repeats,
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "platform": platform.platform(),
        "methodology": (
            "reference Encoder + 1x1 pre-quant conv + VectorQuantizer "
            "(read-only import from /root/reference), eval/no_grad, "
            "best-of-repeats per-iteration wall time on an otherwise-quiet "
            "host; pinned so bench.py's vs_baseline is a property of the "
            "code, not of host load"
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--out",
        type=str,
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts",
            "torch_cpu_baseline.json",
        ),
    )
    args = ap.parse_args()
    result = measure(args.batch, args.iters, args.repeats)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"images_per_sec": result["images_per_sec"], "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
