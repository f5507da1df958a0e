import time, numpy as np, jax, jax.numpy as jnp
from cpfn_tpu import ops
from cpfn_tpu.ops.pallas_kernels import farthest_point_sample_pallas

def t(fn, *a, n=5):
    np.asarray(fn(*a))
    t0=time.time()
    for _ in range(n): r = fn(*a)
    np.asarray(r)
    return (time.time()-t0)/n*1000

rng = np.random.RandomState(0)
for B, N in [(1, 100_000), (1, 8192), (32, 8192)]:
    P = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    ref = jax.jit(lambda p: ops.farthest_point_sample(p, 512))
    pk = jax.jit(lambda p: farthest_point_sample_pallas(p, 512))
    a = np.asarray(ref(P)); b = np.asarray(pk(P))
    print(f"B={B} N={N}: match={np.array_equal(a,b)} xla={t(ref,P):.2f}ms pallas={t(pk,P):.2f}ms", flush=True)
q = jnp.asarray(rng.randn(1, 512, 3), jnp.float32)
P = jnp.asarray(rng.randn(1, 100_000, 3), jnp.float32)
nn3 = jax.jit(lambda q, p: ops.three_nn(q, p)[1])
print("three_nn(new) 100k vs 512:", round(t(nn3, P, q),2), "ms", flush=True)
