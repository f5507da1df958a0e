import time, numpy as np, jax, jax.numpy as jnp
from cpfn_tpu import ops
from cpfn_tpu.nn import PointNet2Config, init_pointnet2
from cpfn_tpu.nn import pointnet2 as pn2

def t(fn, *a, n=10):
    float(fn(*a))
    t0=time.time()
    for _ in range(n): r = fn(*a)
    float(r)
    return (time.time()-t0)/n*1000

rng = np.random.RandomState(0)
P = jnp.asarray(rng.randn(1, 100_000, 3), jnp.float32)
q = jnp.asarray(rng.randn(1, 512, 3), jnp.float32)
feats = jnp.asarray(rng.randn(1, 512, 128), jnp.float32)
cfg = PointNet2Config(output_sizes=(3,4,28))
params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)

nn3 = jax.jit(lambda q, p: jnp.sum(ops.three_nn(q, p)[0]))
print("three_nn 100k/512:", round(t(nn3, P, q),1), "ms", flush=True)
@jax.jit
def interp(P, q, feats):
    d, i = ops.three_nn(P, q)
    w = ops.geometry.interpolation_weights(d)
    return jnp.sum(ops.three_interpolate(feats, i, w))
print("3nn+interp:", round(t(interp, P, q, feats),1), "ms", flush=True)
bq = jax.jit(lambda p, qq: jnp.sum(ops.ball_query(p, qq, 0.2, 64)))
print("ball_query 512x100k:", round(t(bq, P, q),1), "ms", flush=True)
fps = jax.jit(lambda p: jnp.sum(ops.farthest_point_sample(p, 512)))
print("fps 100k:", round(t(fps, P),1), "ms", flush=True)
fwd = jax.jit(lambda P: jnp.sum(pn2.apply_pointnet2(params, state, cfg, P, train=False)[0]["heads"][2]))
print("global fwd 100k:", round(t(fwd, P),1), "ms", flush=True)
P8 = jnp.asarray(rng.randn(1, 8192, 3), jnp.float32)
print("global fwd 8192:", round(t(fwd, P8),1), "ms", flush=True)
P32 = jnp.asarray(rng.randn(32, 8192, 3), jnp.float32)
cfgl = PointNet2Config(output_sizes=(3,4,21))
paramsl, statel = init_pointnet2(jax.random.PRNGKey(1), cfgl)
fwd32 = jax.jit(lambda P: jnp.sum(pn2.apply_pointnet2(paramsl, statel, cfgl, P, train=False)[0]["heads"][2]))
print("local fwd 32x8192:", round(t(fwd32, P32),1), "ms", flush=True)
# train step cost at reference scale (batch 16 x 8192)
from cpfn_tpu.train import SPFNTrainConfig, init_optimizer, make_spfn_train_step
from cpfn_tpu.fitting import factory
factory.register_primitives(["sphere","plane","cylinder","cone"])
tc = SPFNTrainConfig(batch_size=16)
opt = init_optimizer(tc)
opt_state = opt.init(params)
step = jax.jit(make_spfn_train_step(cfg, tc, optimizer=opt))
B=16; N=8192; K=28
batch = {
  "P": jnp.asarray(rng.randn(B,N,3), jnp.float32),
  "normal_gt": jnp.asarray(rng.randn(B,N,3), jnp.float32),
  "P_gt": jnp.asarray(rng.randn(B,K,512,3), jnp.float32),
  "I_gt": jnp.asarray(rng.randint(0,K,(B,N))),
  "T_gt": jnp.asarray(rng.randint(0,4,(B,K))),
  "plane_n_gt": jnp.asarray(rng.randn(B,K,3), jnp.float32),
  "cylinder_axis_gt": jnp.asarray(rng.randn(B,K,3), jnp.float32),
  "cone_axis_gt": jnp.asarray(rng.randn(B,K,3), jnp.float32),
}
def train_once(i):
    global params, state, opt_state
    p,s,o,m = step(params, state, opt_state, batch, jnp.int32(i), jax.random.PRNGKey(i))
    return m["total_loss"]
float(train_once(0))
t0=time.time()
for i in range(5): l = train_once(i)
float(l)
print("train step B16 N8192:", round((time.time()-t0)/5*1000,1), "ms", flush=True)
