"""Device-mesh parallelism for CPFN training and cascaded inference.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed,
no collectives anywhere); scaling here is TPU-native from the start:

- **Data parallelism (`dp`)**: the cloud batch is sharded over the mesh;
  the train step runs under `shard_map` with replicated params, `psum`-mean
  gradients over ICI, and cross-device (sync) batch norm.
- **Patch parallelism**: the cascade's <=32 local patches of one high-res
  cloud are a batch axis with no cross-patch interaction until fusion — the
  CPFN analogue of sequence parallelism. LocalSPFN inference shards the
  patch axis over the same mesh.

Hungarian matching stays a `pure_callback`; under shard_map each device
dispatches its local shard's cost matrices to the host solver independently.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cpfn_tpu.nn import PointNet2Config, apply_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess
from cpfn_tpu.train.steps import SPFNTrainConfig, make_spfn_train_step


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "dp") -> dict:
    """Shard every batch array along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, sharding)


def make_sharded_spfn_train_step(
    model_cfg: PointNet2Config,
    train_cfg: SPFNTrainConfig,
    mesh: Mesh,
    optimizer=None,
    axis_name: str = "dp",
):
    """Data-parallel SPFN train step over `mesh`.

    Per-device batch = global batch / mesh size (the global batch axis must
    divide the mesh). Params/state/opt_state are replicated; gradients are
    pmean'ed over ICI inside the step; BN statistics are synchronized.

    Returns step(params, state, opt_state, batch, step_idx, rng) with the
    same signature as the single-device step.
    """
    inner = make_spfn_train_step(
        model_cfg, train_cfg, optimizer=optimizer, axis_name=axis_name
    )

    def wrapped(params, state, opt_state, batch, step_idx, rng):
        # Same dropout key on every device: with sync BN + pmean'ed grads the
        # replicated state stays bitwise identical across the mesh.
        return inner(params, state, opt_state, batch, step_idx, rng)

    sharded = jax.shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,  # pure_callback inside (Hungarian host dispatch)
    )
    return jax.jit(sharded)


def make_cloud_parallel_cascade(runner, mesh: Mesh, axis_name: str = "dp"):
    """Throughput scaling of the cascaded inference over the mesh: a [B]
    batch of clouds shards over the devices, each running the FULL
    single-dispatch cascade (CascadeRunner.run_cloud_device's graph) on its
    local clouds sequentially via lax.map. Embarrassingly parallel — zero
    collectives — so throughput scales ~linearly with mesh size; this is the
    v5e-8 north-star deployment shape (8 clouds in flight, one per chip).

    `runner` must be a CascadeRunner built WITHOUT a mesh (its single-device
    cascade graph is what gets replicated). Returns
    fn(P_hr [B,N,3], P_lr [B,n,3], pool_mask [B,n] bool | None, keys [B,2])
    -> per-cloud output dict with a leading [B] axis; B must divide by the
    mesh size. pool_mask=None routes through the patch-selection network.
    """
    raw = runner._cascade_device_raw
    raw_ps = runner._cascade_device_ps_raw
    if raw is None:
        raise ValueError("runner was built with a mesh; build it without")
    lm, gm, pm = runner.local_model, runner.global_model, runner.patchselec_model

    def oracle_body(P_hr, P_lr, pool_mask, keys):
        return jax.lax.map(
            lambda args: raw(
                lm.params, lm.state, gm.params, gm.state, *args
            ),
            (P_hr, P_lr, pool_mask, keys),
        )

    def ps_body(P_hr, P_lr, keys):
        return jax.lax.map(
            lambda args: raw_ps(
                lm.params, lm.state, gm.params, gm.state,
                pm.params, pm.state, *args,
            ),
            (P_hr, P_lr, keys),
        )

    sharded_oracle = jax.jit(jax.shard_map(
        oracle_body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    ))
    sharded_ps = jax.jit(jax.shard_map(
        ps_body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )) if raw_ps is not None else None

    def fn(P_hr, P_lr, pool_mask=None, keys=None):
        B = P_hr.shape[0]
        if B % mesh.devices.size != 0:
            raise ValueError(
                f"cloud batch {B} not divisible by mesh size "
                f"{mesh.devices.size}"
            )
        if keys is None:
            keys = jax.random.split(jax.random.PRNGKey(0), B)
        if pool_mask is None:
            if sharded_ps is None:
                raise ValueError("runner has no patch-selection model")
            return sharded_ps(P_hr, P_lr, keys)
        return sharded_oracle(P_hr, P_lr, pool_mask, keys)

    return fn


def make_cloud_parallel_packed(
    runner, mesh: Mesh, axis_name: str = "dp", width: int = 8,
    buckets=(8, 16, 32),
):
    """Cloud-parallel PACKED serving: the packed path's group axis sharded
    over the mesh via `shard_map` — each device runs a self-contained
    group/n_chips-cloud program, so the partitioned graphs contain ZERO
    collective ops **by construction** (tools/mesh_proof.py compiles them
    on the 8-device CPU mesh and asserts it; `__graft_entry__.
    dryrun_multichip` fails if one ever appears). GSPMD auto-partitioning
    of the same vmapped graphs is NOT collective-free in practice: the
    compiler inserts per-iteration while-predicate all-reduces (greedy
    patch extraction / merge loops) and group-axis all-gathers around
    top_k sorts (ball query) — measured round 5, mesh_proof.json.

    Per-group host syncs (one stacked count read, one stacked hard-label
    transfer) amortize over the whole mesh, composing the packed path's
    single-chip dispatch savings with the v5e-8 deployment shape of
    `make_cloud_parallel_cascade`.

    `runner` must be a CascadeRunner built WITHOUT a mesh. Returns
    run(clouds, group=None, key=None) -> generator of per-cloud outputs
    (same stream contract as run_clouds_packed); `group` defaults to
    2 clouds per device and must divide by the mesh size.
    """
    if runner._phase1_batch is None:
        raise ValueError("runner was built with a mesh; build it without")
    sharding = NamedSharding(mesh, P(axis_name))
    n_dev = mesh.devices.size
    graphs = make_packed_mesh_graphs(
        runner, mesh, axis_name=axis_name, width=width
    )

    def run(clouds, group: int | None = None, key=None):
        group = 2 * n_dev if group is None else int(group)
        if group % n_dev:
            raise ValueError(
                f"group {group} not divisible by mesh size {n_dev}"
            )
        return runner.run_clouds_packed(
            clouds, key=key, group=group, width=width, buckets=buckets,
            sharding=sharding, graphs=graphs,
        )

    return run


def make_packed_mesh_graphs(
    runner, mesh: Mesh, axis_name: str = "dp", width: int = 8,
):
    """shard_map-wrapped packed phase graphs: group axis split over the
    mesh, params/state replicated, every per-device program independent
    (no collectives possible — nothing in the bodies communicates).
    Returns the {"phase1", "phase1_ps", "phase2"} dict that
    `CascadeRunner.run_clouds_packed(graphs=...)` consumes."""
    dp = P(axis_name)
    rep = P()

    def shmap(fn, in_specs):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=dp,
            check_vma=False,
        ))

    graphs = {
        "phase1": shmap(
            runner._phase1_batch_raw, (rep, rep, dp, dp, dp, dp)
        ),
    }
    if runner._phase1_batch_ps_raw is not None:
        graphs["phase1_ps"] = shmap(
            runner._phase1_batch_ps_raw,
            (rep, rep, rep, rep, dp, dp, dp),
        )
    # phase 2's `width` is a static python int inside the body — close over
    # it (shard_map has no static args)
    raw2 = runner._phase2_packed_raw
    n_data_args = runner._phase2_packed_width_argnum - 2  # minus lp, ls

    def p2_body(lp, ls, *data):
        return raw2(lp, ls, *data, width)

    p2 = shmap(p2_body, (rep, rep) + (dp,) * n_data_args)

    def p2_fn(lp, ls, *args):
        # drop the trailing width the runner passes; the wrapped graph
        # closed over it
        assert args[-1] == width, (args[-1], width)
        return p2(lp, ls, *args[:-1])

    p2_fn.jitted = p2  # exposed for HLO inspection (tools/mesh_proof.py)
    graphs["phase2"] = p2_fn
    return graphs


_COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter", "collective-broadcast", "ragged-all-to-all",
)


def scan_hlo_for_collectives(hlo_text: str) -> list:
    """Names of collective ops present at instruction positions in optimized
    HLO (start-variants like `all-reduce-start` match the base name)."""
    found = set()
    for line in hlo_text.splitlines():
        s = line.lstrip()
        if " = " not in s:
            continue
        rhs = s.split(" = ", 1)[1]
        for c in _COLLECTIVE_OPS:
            if rhs.startswith(c) or (" " + c + "(") in rhs:
                found.add(c)
    return sorted(found)


def make_patch_parallel_forward(
    model_cfg: PointNet2Config, mesh: Mesh, axis_name: str = "dp"
):
    """LocalSPFN inference with the patch axis sharded over the mesh.

    Returns forward(params, state, patches [P, n, 3], glob [P, Gd] | None,
    loc [P, Ld] | None) -> (X, T, W) with every output sharded on the patch
    axis; P must be a multiple of the mesh size (pad with dummy patches and
    mask at the caller).
    """

    def fwd(params, state, patches, glob_features, loc_features):
        out, _ = apply_pointnet2(
            params, state, model_cfg, patches,
            glob_features=glob_features, loc_features=loc_features,
            train=False,
        )
        return spfn_postprocess(out)

    sharded = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return jax.jit(sharded)
