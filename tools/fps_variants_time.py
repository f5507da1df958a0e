"""Round-5 FPS latency sweep: current batched kernel vs the stacked-plane
rework at several unrolls, on the cascade's SA1 shapes, with hardware
bit-parity vs the XLA path asserted per variant (the rework must be
bit-identical, not just interpret-identical).

The motivation: post-BQ-rework, local_sa1 is ~28 ms of local_fwd's 45.9 and
the sequential FPS chain (~14 ms, 512 iterations at ~27us each) is the named
next bottleneck — per-op overhead in the Mosaic loop body, not VPU volume
(~1us/iteration of elementwise work). See `_fps_batched_kernel_stacked`.

Run on the chip (exclusive claim): python tools/fps_variants_time.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _t(fn, reps=10):
    out = fn()
    np.asarray(np.asarray(out).ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(np.asarray(out).ravel()[:1])
    return (time.time() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from cpfn_tpu.ops.geometry import farthest_point_sample
    from cpfn_tpu.ops.pallas_kernels import (
        _farthest_point_sample_pallas_batched,
        _farthest_point_sample_pallas_stacked,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    res = {}
    shapes = {
        "local_sa1_32x8192": (32, 8192, 512),
        "packed_sa1_8x8192": (8, 8192, 512),
    }
    for name, (B, N, S) in shapes.items():
        pts = jnp.asarray(rng.randn(B, N, 3) * 0.5, jnp.float32)
        ref = np.asarray(farthest_point_sample(pts, S, impl="xla"))
        row = {}

        got = np.asarray(_farthest_point_sample_pallas_batched(pts, S))
        assert np.array_equal(got, ref), f"batched parity FAIL {name}"
        row["batched_ms"] = round(
            _t(lambda: _farthest_point_sample_pallas_batched(pts, S)), 2
        )
        print(f"[fps_variants] {name} batched {row['batched_ms']} ms",
              file=sys.stderr, flush=True)

        # Mosaic's scan lowering supports only unroll=1 or full unroll
        # (NotImplementedError at lowering for 2/4/8, measured 2026-08-21);
        # full unroll of a 511-step loop is compile-time-prohibitive over
        # the tunnel, so the sweep is u1 vs the batched kernel only.
        for unroll in (1,):
            got = np.asarray(
                _farthest_point_sample_pallas_stacked(pts, S, unroll)
            )
            assert np.array_equal(got, ref), (
                f"stacked u{unroll} parity FAIL {name}"
            )
            row[f"stacked_u{unroll}_ms"] = round(
                _t(lambda u=unroll:
                   _farthest_point_sample_pallas_stacked(pts, S, u)), 2
            )
            print(
                f"[fps_variants] {name} stacked u{unroll} "
                f"{row[f'stacked_u{unroll}_ms']} ms",
                file=sys.stderr, flush=True,
            )
        res[name] = row
    print(json.dumps(res))


if __name__ == "__main__":
    main()
