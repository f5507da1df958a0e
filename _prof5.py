import time, numpy as np, jax, jax.numpy as jnp
from cpfn_tpu import ops
from cpfn_tpu.nn import PointNet2Config, init_pointnet2
from cpfn_tpu.nn import pointnet2 as pn2

def t(fn, *a, n=5):
    np.asarray(jax.tree_util.tree_leaves(fn(*a))[0])
    t0=time.time()
    for _ in range(n): r = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.time()-t0)/n*1000

rng = np.random.RandomState(0)
P = jnp.asarray(rng.randn(1, 100_000, 3), jnp.float32)
q = jnp.asarray(rng.randn(1, 512, 3), jnp.float32)
feats = jnp.asarray(rng.randn(1, 512, 128), jnp.float32)

nn3 = jax.jit(lambda q, p: ops.three_nn(q, p))
print("three_nn 100k vs 512:", round(t(nn3, P, q),1), "ms", flush=True)

@jax.jit
def interp(P, q, feats):
    d, i = ops.three_nn(P, q)
    w = ops.geometry.interpolation_weights(d)
    return ops.three_interpolate(feats, i, w)
print("3nn+interp:", round(t(interp, P, q, feats),1), "ms", flush=True)

cfg = PointNet2Config(output_sizes=(3,4,28))
params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
@jax.jit
def fp3(P, q, feats):
    return pn2._feature_propagation(params["fp3"], state["fp3"], P, q, None, feats, train=False, momentum=0.5)[0]
print("FP3 full:", round(t(fp3, P, q, feats),1), "ms", flush=True)
fwd = jax.jit(lambda P: pn2.apply_pointnet2(params, state, cfg, P, train=False)[0]["heads"][2])
print("global fwd 100k:", round(t(fwd, P),1), "ms", flush=True)
P8 = jnp.asarray(rng.randn(1, 8192, 3), jnp.float32)
print("global fwd 8192:", round(t(fwd, P8),1), "ms", flush=True)
P32 = jnp.asarray(rng.randn(32, 8192, 3), jnp.float32)
cfgl = PointNet2Config(output_sizes=(3,4,21))
paramsl, statel = init_pointnet2(jax.random.PRNGKey(1), cfgl)
fwd32 = jax.jit(lambda P: pn2.apply_pointnet2(paramsl, statel, cfgl, P, train=False)[0]["heads"][2])
print("local fwd 32x8192:", round(t(fwd32, P32),1), "ms", flush=True)
