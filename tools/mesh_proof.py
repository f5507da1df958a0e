"""Checked zero-collective proof for packed cloud-parallel serving.

The v5e-8 north-star claim rests on "one cascade per chip, zero cross-chip
communication" (PERF.md): the packed two-phase graphs have no cross-cloud
data flow, so sharding their group axis over the mesh must introduce NO
collective ops — the throughput then scales as chips x single-chip rate,
bounded only by per-group host syncs (which amortize over all chips).

This tool makes that a checked artifact instead of prose: it lowers and
compiles BOTH packed phase graphs on an 8-device CPU mesh with the group
axis sharded (exactly `parallel.make_cloud_parallel_packed`'s placement),
scans the optimized HLO for collectives, and records the per-cloud device
ops / host-transfer budget vs the single-dispatch path.

  python tools/mesh_proof.py           # writes artifacts_r5/mesh_proof.json

The same scan runs (and FAILS the stage) inside __graft_entry__.
dryrun_multichip, so a regression that introduces a collective cannot pass
the driver's multi-chip validation.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize sets jax_platforms at interpreter startup,
# overriding the env var — force it back before any backend initializes
# (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

COLLECTIVES = (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter", "collective-broadcast", "ragged-all-to-all",
)


def scan_hlo_for_collectives(hlo_text: str) -> list:
    """Names of collective ops present in optimized HLO (start-variants
    included: `all-reduce-start` etc. contain the base name)."""
    found = []
    for line in hlo_text.splitlines():
        s = line.lstrip()
        # match op names at instruction positions: "x = all-reduce(...)"
        if " = " not in s:
            continue
        rhs = s.split(" = ", 1)[1]
        for c in COLLECTIVES:
            if rhs.startswith(c) or (" " + c + "(") in rhs:
                found.append(c)
    return sorted(set(found))


def packed_mesh_hlos(n_devices: int = 8, group: int = 8):
    """Compile the packed phase graphs with the group axis sharded over an
    `n_devices` CPU mesh; returns {graph_name: optimized_hlo_text} plus the
    shapes used. Mirrors parallel.make_cloud_parallel_packed's placement."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from cpfn_tpu.eval import CascadeRunner, ModelBundle
    from cpfn_tpu.nn import PointNet2Config, init_pointnet2

    tiny = dict(
        sa1_points=16, sa2_points=8, sa1_samples=8, sa2_samples=8,
        sa1_mlp=(16, 16), sa2_mlp=(16, 16), sa3_mlp=(16, 32),
        fp1_mlp=(16, 16), fp2_mlp=(16, 16), fp3_mlp=(16, 16), fc_dim=16,
    )
    N_HR, N_LR, NPP, MAXP, K_G, K_L, Q = 512, 128, 128, 4, 6, 5, 4
    WIDTH = 2

    def bundle(key, sizes):
        cfg = PointNet2Config(output_sizes=sizes, **tiny)
        p, s = init_pointnet2(key, cfg)
        return ModelBundle(cfg, p, s)

    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    runner = CascadeRunner(
        bundle(keys[0], (3, Q, K_G)), bundle(keys[1], (2,)),
        bundle(keys[2], (3, Q, K_L)),
        n_max_global_instances=K_G, n_max_local_instances=K_L,
        num_points_patch=NPP, max_patches=MAXP,
    )
    mesh = Mesh(np.array(jax.devices("cpu")[:n_devices]), ("dp",))
    sh = NamedSharding(mesh, PartitionSpec("dp"))
    rep = NamedSharding(mesh, PartitionSpec())

    gm, lm = runner.global_model, runner.local_model
    gp, gs = jax.device_put((gm.params, gm.state), rep)
    lp, ls = jax.device_put((lm.params, lm.state), rep)

    rng = np.random.RandomState(0)
    P_hr = jax.device_put(
        jnp.asarray(rng.randn(group, N_HR, 3), jnp.float32), sh
    )
    P_lr = jax.device_put(
        jnp.asarray(rng.randn(group, N_LR, 3), jnp.float32), sh
    )
    pool = jax.device_put(jnp.asarray(rng.rand(group, N_LR) < 0.2), sh)
    ks = jax.device_put(
        jnp.stack([jax.random.PRNGKey(i) for i in range(group)]), sh
    )

    from cpfn_tpu.parallel.mesh import make_packed_mesh_graphs

    graphs = make_packed_mesh_graphs(runner, mesh, width=WIDTH)
    hlos = {}
    lowered1 = graphs["phase1"].lower(gp, gs, P_hr, P_lr, pool, ks)
    hlos["phase1_batch"] = lowered1.compile().as_text()
    staged = graphs["phase1"](gp, gs, P_hr, P_lr, pool, ks)
    p2_args = (
        lp, ls, P_hr, staged["idx"], staged["mask"],
        staged["W_hard"], staged["X_g"], staged["T_g"], staged["count"],
    )
    # graphs["phase2"] is the runner-facing wrapper (expects trailing
    # width); its .jitted attribute is the underlying shard_map jit
    hlos["phase2_packed"] = (
        graphs["phase2"].jitted.lower(*p2_args).compile().as_text()
    )

    # contrast: GSPMD auto-partitioning of the same vmapped graphs (the
    # round-4 design) — recorded so the shard_map requirement is evidence,
    # not lore
    gspmd = {}
    gspmd["phase1_batch"] = runner._phase1_batch.lower(
        gp, gs, P_hr, P_lr, pool, ks
    ).compile().as_text()
    gspmd["phase2_packed"] = runner._phase2_packed.lower(
        *p2_args, WIDTH
    ).compile().as_text()

    shapes = {
        "n_devices": n_devices, "group": group, "width": WIDTH,
        "n_hr": N_HR, "n_lr": N_LR,
    }
    return hlos, gspmd, shapes


def assert_zero_collectives(n_devices: int = 8, group: int = 8) -> dict:
    """Raises if any collective op appears in the shard_map packed mesh
    graphs. Returns the proof dict (also used by tools/mesh_proof.py main),
    including the GSPMD contrast (which DOES contain collectives — the
    reason the serving path is shard_map)."""
    hlos, gspmd, shapes = packed_mesh_hlos(n_devices, group)
    per_graph = {k: scan_hlo_for_collectives(v) for k, v in hlos.items()}
    gspmd_found = {
        k: scan_hlo_for_collectives(v) for k, v in gspmd.items()
    }
    bad = {k: v for k, v in per_graph.items() if v}
    assert not bad, f"collectives found in packed mesh graphs: {bad}"
    # Device-op / host-transfer budget per cloud (static accounting of the
    # run_clouds_packed loop): per GROUP, 2 dispatches (phase1, phase2) + 1
    # stacked count read [G]i32 + 1 stacked hard read [G,N]i32; uploads are
    # 1 put per operand (P_hr, P_lr, pool, keys). The single-dispatch path
    # pays 1 dispatch + 1 hard read [N] + its uploads PER CLOUD.
    n_hr = shapes["n_hr"]
    g = shapes["group"]
    proof = {
        "graphs": sorted(hlos),
        "collectives_found": per_graph,
        "gspmd_contrast_collectives": gspmd_found,
        "mesh_devices": shapes["n_devices"],
        "group": g,
        "packed_dispatches_per_cloud": 2 / g,
        "packed_host_reads_per_cloud": 2 / g,
        "packed_bytes_to_host_per_cloud": (4 + n_hr * 4) / g + 0,
        "single_dispatches_per_cloud": 1,
        "single_host_reads_per_cloud": 1,
        "single_bytes_to_host_per_cloud": n_hr * 4,
        "note": (
            "zero collectives in both packed phase graphs on the "
            f"{shapes['n_devices']}-device mesh: cloud-parallel packed "
            "serving scales as chips x single-chip rate; host syncs "
            "amortize over the group"
        ),
    }
    return proof


def main():
    proof = assert_zero_collectives()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts_r5",
    )
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "mesh_proof.json")
    with open(path, "w") as f:
        json.dump(proof, f, indent=1)
    print(json.dumps(proof))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
