"""Ball-query chunk-width sweep on the bench shapes (round-4 bottleneck).

The TPU roofline puts local_sa1 at 64 of local_fwd's 82 ms, and the op table
puts the streaming ball query at ~48 ms of that — the cascade's next
quantitative bottleneck. The kernel's chunk width W (CPFN_BQ_CHUNK) trades
the O(W^2) per-chunk ranking matmul against while-loop trips and early-exit
granularity; this sweeps W at the two shapes the cascade dispatches and
prints a JSON table for picking the default.

Run on the chip (exclusive claim): python tools/bq_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cpfn_tpu.ops.pallas_kernels import ball_query_pallas
    from cpfn_tpu.ops import farthest_point_sample

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)

    shapes = {
        # the LocalSPFN SA1 shape: 32 patches x 8192 pts -> 512 centers
        "local_sa1_32x8192": (32, 8192, 512, 0.2, 64),
        # the GlobalSPFN SA1 shape: 1 x 100k pts -> 512 centers
        "global_sa1_1x100k": (1, 100_000, 512, 0.2, 64),
    }
    chunks = [int(w) for w in os.environ.get(
        "BQ_SWEEP_CHUNKS", "256,512,1024,2048,4096,8192").split(",")]
    reps = 10
    rows = {}
    for name, (B, N, S, r, K) in shapes.items():
        pts = jnp.asarray(rng.randn(B, N, 3) * 0.5, jnp.float32)
        centers_idx = farthest_point_sample(pts, S)
        centers = jnp.take_along_axis(
            pts, np.asarray(centers_idx)[..., None].repeat(3, -1), axis=1
        )
        np.asarray(centers.ravel()[:1])
        rows[name] = {}
        for W in chunks:
            fn = lambda p, c: ball_query_pallas(p, c, r, K, chunk=W)
            try:
                out = fn(pts, centers)  # compile
                np.asarray(out.ravel()[:1])
            except Exception as e:  # VMEM overflow at large W is expected
                rows[name][str(W)] = None
                print(f"{name} W={W}: FAILED ({type(e).__name__})",
                      file=sys.stderr, flush=True)
                continue
            t0 = time.time()
            for _ in range(reps):
                out = fn(pts, centers)
            np.asarray(out.ravel()[:1])
            ms = (time.time() - t0) / reps * 1e3
            rows[name][str(W)] = round(ms, 2)
            print(f"{name} W={W}: {ms:.2f} ms", file=sys.stderr, flush=True)
    print(json.dumps({"ball_query_ms": rows, "reps": reps}))


if __name__ == "__main__":
    main()
