"""FPS kernel timing + hardware parity on the bench shapes.

After the ball-query rework, the post-rework roofline puts local_sa1 at
28.4 ms of local_fwd's 45.9 and names the sequential FPS chain (~14 ms,
512 latency-bound iterations) as the next bottleneck. This times the
Pallas FPS variants at the cascade's two SA1 shapes and pins each one
equal to the XLA fori_loop path on hardware (the mask-sweep-elimination
rework must be bit-identical, not just interpret-identical).

Run on the chip (exclusive claim): python tools/fps_time.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _t(fn, reps=10):
    out = fn()
    np.asarray(np.asarray(out).ravel()[:1])  # force materialization (tunnel)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(np.asarray(out).ravel()[:1])
    return (time.time() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from cpfn_tpu.ops.geometry import farthest_point_sample
    from cpfn_tpu.ops.pallas_kernels import farthest_point_sample_pallas

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    res = {}
    shapes = {
        # LocalSPFN SA1: 32 patches x 8192 pts -> 512 centers (batched kernel)
        "local_sa1_32x8192": (32, 8192, 512),
        # packed phase-2 local stack at width 8
        "packed_sa1_8x8192": (8, 8192, 512),
        # GlobalSPFN SA1: 1 x 100k -> 512 (per-batch kernel)
        "global_sa1_1x100k": (1, 100_000, 512),
    }
    for name, (B, N, S) in shapes.items():
        pts = jnp.asarray(rng.randn(B, N, 3) * 0.5, jnp.float32)
        print(f"[fps_time] {name}: parity vs XLA...", file=sys.stderr,
              flush=True)
        got = np.asarray(farthest_point_sample_pallas(pts, S))
        ref = np.asarray(farthest_point_sample(pts, S, impl="xla"))
        if not np.array_equal(got, ref):
            bad = int((got != ref).sum())
            print(f"[fps_time] PARITY FAIL {name}: {bad} mismatches",
                  file=sys.stderr, flush=True)
            res[f"{name}_parity"] = "FAIL"
        else:
            res[f"{name}_parity"] = "ok"
        print(f"[fps_time] {name}: timing...", file=sys.stderr, flush=True)
        res[f"{name}_ms"] = round(
            _t(lambda: farthest_point_sample_pallas(pts, S)), 2
        )
    print(json.dumps(res))
    return 0 if all(
        v == "ok" for k, v in res.items() if k.endswith("_parity")
    ) else 1


if __name__ == "__main__":
    sys.exit(main())
