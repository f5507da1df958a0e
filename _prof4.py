# stage-internal breakdown of the global forward at N=100k
import time, numpy as np, jax, jax.numpy as jnp, functools
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
cfg = PointNet2Config(output_sizes=(3,4,28))
params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
kw = dict(train=False, momentum=0.5)

@jax.jit
def sa1(P):
    return pn2._set_abstraction(params["sa1"], state["sa1"], P, None,
        num_points=512, radius=0.2, num_samples=64, fps_impl="auto", **kw)[:2]
print("SA1(100k->512):", round(t(sa1, P),1), "ms", flush=True)

l1_pos, l1_feats = sa1(P)
@jax.jit
def sa2(l1_pos, l1_feats):
    return pn2._set_abstraction(params["sa2"], state["sa2"], l1_pos, l1_feats,
        num_points=128, radius=0.4, num_samples=64, fps_impl="auto", **kw)[:2]
print("SA2(512->128):", round(t(sa2, l1_pos, l1_feats),1), "ms", flush=True)

l2_pos, l2_feats = sa2(l1_pos, l1_feats)
@jax.jit
def sa3(l2_pos, l2_feats):
    return pn2._group_all(params["sa3"], state["sa3"], l2_pos, l2_feats, **kw)[0]
print("SA3:", round(t(sa3, l2_pos, l2_feats),1), "ms", flush=True)

l3 = sa3(l2_pos, l2_feats)[:, None] if sa3(l2_pos, l2_feats).ndim==2 else sa3(l2_pos, l2_feats)
l3_feats = sa3(l2_pos, l2_feats)
@jax.jit
def fps(l2_pos, l2_feats, l3_feats):
    a, _ = pn2._feature_propagation(params["fp1"], state["fp1"], l2_pos, None, l2_feats, l3_feats[:,None] if l3_feats.ndim==2 else l3_feats, **kw)
    b, _ = pn2._feature_propagation(params["fp2"], state["fp2"], l1_pos, l2_pos, l1_feats, a, **kw)
    return b
print("FP1+FP2:", round(t(fps, l2_pos, l2_feats, l3_feats),1), "ms", flush=True)

l5 = fps(l2_pos, l2_feats, l3_feats)
@jax.jit
def fp3(P, l1_pos, l5):
    return pn2._feature_propagation(params["fp3"], state["fp3"], P, l1_pos, None, l5, **kw)[0]
print("FP3(->100k):", round(t(fp3, P, l1_pos, l5),1), "ms", flush=True)

l6 = fp3(P, l1_pos, l5)
from cpfn_tpu.nn import layers
@jax.jit
def head(l6):
    x = layers.linear_apply(params["fc1"], l6)
    x, _ = layers.bn_apply(params["bn1"], state["bn1"], x, train=False, momentum=0.5)
    x = jax.nn.relu(x)
    return [layers.linear_apply(h, x) for h in params["heads"]]
print("fc+heads(100k):", round(t(head, l6),1), "ms", flush=True)

# SA1 sub-pieces
@jax.jit
def sa1_fps(P): return ops.farthest_point_sample(P, 512, impl="pallas")
print("  SA1 fps:", round(t(sa1_fps, P),1), "ms", flush=True)
idx = sa1_fps(P)
new_pos = ops.gather_points(P, idx)
@jax.jit
def sa1_bq(P, new_pos): return ops.ball_query(P, new_pos, 0.2, 64)
print("  SA1 ball_query:", round(t(sa1_bq, P, new_pos),1), "ms", flush=True)
gidx = sa1_bq(P, new_pos)
@jax.jit
def sa1_gather(P, gidx, new_pos):
    return ops.gather_points(P, gidx) - new_pos[:, :, None, :]
print("  SA1 gather:", round(t(sa1_gather, P, gidx, new_pos),1), "ms", flush=True)
