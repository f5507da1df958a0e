import time, numpy as np, jax, jax.numpy as jnp
from cpfn_tpu import ops
from cpfn_tpu.ops.pallas_kernels import ball_query_pallas

def t(fn, *a, n=10):
    float(fn(*a))
    t0=time.time()
    for _ in range(n): r = fn(*a)
    float(r)
    return (time.time()-t0)/n*1000

rng = np.random.RandomState(0)
# correctness vs XLA path on structured clouds (points on surfaces)
from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_scene
cfg = SyntheticSceneConfig(n_points=4096, n_max_instances=8, min_instances=3, max_instances=6, n_gt_points_per_instance=32)
scene = make_synthetic_scene(rng, cfg)
P = jnp.asarray(scene["noisy_points"][None], jnp.float32)
idx = ops.farthest_point_sample(P, 256)
Q = ops.gather_points(P, idx)
for r, K in [(0.2, 64), (0.4, 32)]:
    a = np.asarray(ops.ball_query(P, Q, r, K))
    b = np.asarray(ball_query_pallas(P, Q, r, K))
    print(f"r={r} K={K} match={np.array_equal(a,b)}", "diff" if not np.array_equal(a,b) else "", flush=True)
    if not np.array_equal(a,b):
        w = np.where(a!=b); print("mismatches:", len(w[0]), a[w][:5], b[w][:5])
# perf at production shapes
P = jnp.asarray(rng.randn(1, 100_000, 3).astype(np.float32)*0.5)
Q = jnp.asarray(rng.randn(1, 512, 3).astype(np.float32)*0.5)
xla = jax.jit(lambda p,q: jnp.sum(ops.ball_query(p, q, 0.2, 64)))
pal = jax.jit(lambda p,q: jnp.sum(ball_query_pallas(p, q, 0.2, 64)))
print("xla 512x100k:", round(t(xla, P, Q),1), "ms", flush=True)
print("pallas 512x100k:", round(t(pal, P, Q),1), "ms", flush=True)
a = np.asarray(ops.ball_query(P, Q, 0.2, 64)); b = np.asarray(ball_query_pallas(P, Q, 0.2, 64))
print("100k match:", np.array_equal(a,b))
P32 = jnp.asarray(rng.randn(32, 8192, 3).astype(np.float32)*0.5)
Q32 = jnp.asarray(rng.randn(32, 512, 3).astype(np.float32)*0.5)
xla32 = jax.jit(lambda p,q: jnp.sum(ops.ball_query(p, q, 0.2, 64)))
pal32 = jax.jit(lambda p,q: jnp.sum(ball_query_pallas(p, q, 0.2, 64)))
print("xla 32x512x8192:", round(t(xla32, P32, Q32),1), "ms", flush=True)
print("pallas 32x512x8192:", round(t(pal32, P32, Q32),1), "ms", flush=True)
a = np.asarray(ops.ball_query(P32, Q32, 0.2, 64)); b = np.asarray(ball_query_pallas(P32, Q32, 0.2, 64))
print("32x8192 match:", np.array_equal(a,b))
