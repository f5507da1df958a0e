"""The cascaded CPFN inference pipeline — the framework's north-star path.

Per high-res cloud (cf. `evaluation_globalSPFN.py` + `evaluation_PatchSelection.py`
+ `evaluation_localSPFN.py`, collapsed into one in-memory pipeline instead of
three CLIs communicating through .npy artifacts):

  1. GlobalSPFN forward on the full ~100k-point cloud -> hard segmentation,
     normals, type scores (plus the global/per-point features).
  2. PatchSelection forward on the normalized low-res cloud -> per-point
     small-primitive heatmap -> greedy NN patch extraction (host).
  3. LocalSPFN forward on the patch stack (padded to a fixed width of
     `max_patches` so one compiled graph serves every cloud; a validity mask
     zeroes padding downstream).
  4. Cross-scale fusion (device similarity + C++ greedy merge).

All device stages are jitted once with static shapes; the only host work is
patch extraction and the greedy merge.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.eval.sampling import sample_patches
from cpfn_tpu.merging import fuse_cascade
from cpfn_tpu.metrics import hard_W_encoding
from cpfn_tpu.nn import PointNet2Config, apply_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess


@dataclasses.dataclass
class ModelBundle:
    cfg: PointNet2Config
    params: Any
    state: Any


class CascadeRunner:
    def __init__(
        self,
        global_model: ModelBundle,
        patchselec_model: ModelBundle | None,
        local_model: ModelBundle,
        *,
        n_max_global_instances: int = 28,
        n_max_local_instances: int = 21,
        num_points_patch: int = 8192,
        max_patches: int = 32,
        scale: float = 0.05,
        out_width: int | None = None,
        mesh=None,
        n_shuffles: int = 1,
    ):
        self.global_model = global_model
        self.patchselec_model = patchselec_model
        self.local_model = local_model
        self.n_max_global = n_max_global_instances
        self.n_max_local = n_max_local_instances
        self.num_points_patch = num_points_patch
        self.max_patches = max_patches
        self.scale = scale
        # shuffle-ensemble width for the single-dispatch cascade: forwards
        # per stage over independent point permutations, soft outputs
        # averaged after relaxed-IoU slot alignment (eval/ensemble.py).
        # R=1 (default) is the single-forward serving path.
        self.n_shuffles = max(1, int(n_shuffles))
        # fixed fused-output width (device-side column compaction); defaults
        # to K_g + K_l slack so surviving clusters are rarely dropped
        self.out_width = (
            out_width
            if out_width is not None
            else n_max_global_instances + n_max_local_instances
        )

        # Feature-injected LocalSPFN (the v11 quality path): the local
        # forward consumes the GLOBAL forward's code (glob, [1024]) and the
        # per-patch feature at each patch's SEED point (loc, [128]) — the
        # reference wires this via pn2_network.py:22-27 + the per-patch
        # feature broadcast in dataloaders.py:275-281 but never trains it.
        # All injection below is gated on the local config so feature-free
        # graphs keep byte-identical HLO (and their committed XLA cache
        # entries stay valid).
        self._use_lfeat = bool(
            local_model.cfg.use_glob_features
            or local_model.cfg.use_loc_features
        )
        use_lfeat = self._use_lfeat

        def local_feature_kwargs(g_feat, loc_feat, n_rows):
            kw = {}
            if local_model.cfg.use_glob_features:
                kw["glob_features"] = jnp.broadcast_to(
                    g_feat[None], (n_rows, g_feat.shape[-1])
                )
            if local_model.cfg.use_loc_features:
                kw["loc_features"] = loc_feat
            return kw

        # Every network forward below runs on a SHUFFLED point order and
        # unshuffles its per-point outputs: the networks are point-order
        # sensitive (FPS seeds at index 0, first-K ball query) and train on
        # shuffled orders, while stored cloud/patch orders are structured
        # (instance-sorted clouds, kNN-sorted patches) — a distribution the
        # models were never trained on (round-3 finding: -0.14 patch IoU).
        def global_fwd(params, state, P, key):
            perm = jax.random.permutation(key, P.shape[0])
            inv = jnp.argsort(perm)
            out, _ = apply_pointnet2(
                params, state, global_model.cfg, P[perm][None], train=False
            )
            X, T, W = spfn_postprocess(out)
            W_hard = hard_W_encoding(W)
            return (
                X[0][inv], T[0][inv], W_hard[0][inv],
                out["global_feat"][0], out["point_feat"][0][inv],
            )

        self._global_fwd = jax.jit(global_fwd)
        self._fwd_rng = np.random.RandomState(1789)

        if patchselec_model is not None:
            def ps_fwd(params, state, P, key):
                perm = jax.random.permutation(key, P.shape[0])
                inv = jnp.argsort(perm)
                out, _ = apply_pointnet2(
                    params, state, patchselec_model.cfg, P[perm][None],
                    train=False,
                )
                return jnp.argmax(out["heads"][0][0], axis=-1)[inv]

            self._ps_fwd = jax.jit(ps_fwd)

        if mesh is not None:
            # patch-axis parallelism: the <=32 local patches shard over the
            # mesh (the CPFN analogue of sequence parallelism)
            from cpfn_tpu.parallel import make_patch_parallel_forward, replicate

            assert max_patches % mesh.devices.size == 0, (
                max_patches, mesh.devices.size,
            )
            sharded_fwd = make_patch_parallel_forward(local_model.cfg, mesh)
            lp = replicate(local_model.params, mesh)
            ls = replicate(local_model.state, mesh)
            gd = local_model.cfg.glob_feature_dim
            ld = local_model.cfg.loc_feature_dim

            def local_fwd_mesh(params, state, patches):
                del params, state
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(mesh, P("dp"))
                patches = jax.device_put(patches, sh)
                glob = jax.device_put(
                    jnp.zeros((patches.shape[0], gd), jnp.float32), sh
                )
                loc = jax.device_put(
                    jnp.zeros((patches.shape[0], ld), jnp.float32), sh
                )
                return sharded_fwd(lp, ls, patches, glob, loc)

            self._local_fwd = local_fwd_mesh
        else:
            def local_fwd(params, state, patches):
                out, _ = apply_pointnet2(
                    params, state, local_model.cfg, patches, train=False
                )
                return spfn_postprocess(out)

            self._local_fwd = jax.jit(local_fwd)

        def normalize_patches(P_hr, idx):
            raw = P_hr[idx]  # [P, n, 3]
            mean = jnp.mean(raw, axis=1, keepdims=True)
            centered = raw - mean
            norm = jnp.max(
                jnp.linalg.norm(centered, axis=2, keepdims=True),
                axis=1, keepdims=True,
            )
            return centered / jnp.maximum(norm, 1e-12)

        self._normalize_patches = jax.jit(normalize_patches)

        if mesh is None:
            # the whole device back half — patch normalization, LocalSPFN
            # forward, similarity, on-device greedy merge, fused membership,
            # column compaction, normal/type fusion — as ONE dispatch
            # (9 separate calls otherwise; dispatch latency is real on
            # tunneled runtimes)
            from cpfn_tpu.merging.fusion import fuse_cascade_fast

            k_g, k_l = self.n_max_global, self.n_max_local

            @jax.jit
            def phase2_device(lp, ls, P_hr, idx, mask, W_hard, X_g, T_g,
                              g_feat=None, loc_feat=None):
                # width-polymorphic: idx may be any [W, n] patch stack (the
                # bucketed serving path calls this at W in {8, 16, 32}); the
                # jit compiles one executable per width and the padded-width
                # invariance is pinned by tests/test_cascade_buckets.py.
                # Feature-free callers omit g_feat/loc_feat (identical HLO).
                patches = normalize_patches(P_hr, idx)
                kw = (
                    local_feature_kwargs(
                        g_feat, loc_feat[: idx.shape[0]], idx.shape[0]
                    )
                    if use_lfeat else {}
                )
                out, _ = apply_pointnet2(
                    lp, ls, local_model.cfg, patches, train=False, **kw
                )
                X_p, T_p, W_p = spfn_postprocess(out)
                # patch-major fast fusion, same as the single-dispatch graph
                # (fusion.py: the point-major [N, P, K_l] scatter pays
                # partial-lane update rows, ~40 ms at the north-star shape vs
                # ~7 ms patch-major; outputs are bit-identical — the parity
                # suites pin phase-2 == single-dispatch)
                return fuse_cascade_fast(
                    W_p, X_p, T_p, idx, W_hard, X_g, T_g,
                    k_g, k_l, out_width=self.out_width, patch_mask=mask,
                )

            self._phase2_device = phase2_device

            def phase2_packed(lp, ls, P_hr, idx, mask, W_hard, X_g, T_g,
                              count, width, g_feat=None, loc_feat=None):
                """Per-cloud phase-2 body for the PACKED serving path
                (vmapped over a group of clouds): the fused back half plus
                the empty-pool global-only fallback and the hard argmax,
                so one packed dispatch returns exactly what the
                single-dispatch graph returns for these outputs — no
                per-cloud follow-up dispatches (the bucketed path's
                separate argmax/fallback ops each cost a dispatch, which
                tools/bucket_diag.py measured as the binder). Takes the
                FULL-width idx/mask and slices to the static packed width
                inside the graph (host-side slices of device arrays would
                each be their own dispatch)."""
                feat_args = (g_feat, loc_feat) if use_lfeat else ()
                W_f, X_f, T_f, n_valid = phase2_device(
                    lp, ls, P_hr, idx[:width], mask[:width],
                    W_hard, X_g, T_g, *feat_args,
                )
                out_w = max(self.out_width, k_g)
                W_glob = jnp.pad(W_hard, ((0, 0), (0, out_w - k_g)))
                W_f = jnp.where(count > 0, W_f, W_glob)
                hard = jnp.argmax(W_f, axis=1).astype(jnp.int32)
                return W_f, X_f, T_f, n_valid, hard

            if use_lfeat:
                # the per-cloud feature operands ride the vmapped group axis
                def phase2_packed_feat(lp, ls, P_hr, idx, mask, W_hard, X_g,
                                       T_g, g_feat, loc_feat, count, width):
                    return phase2_packed(
                        lp, ls, P_hr, idx, mask, W_hard, X_g, T_g, count,
                        width, g_feat=g_feat, loc_feat=loc_feat,
                    )

                self._phase2_packed_raw = jax.vmap(
                    phase2_packed_feat,
                    in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, None),
                )
                self._phase2_packed = jax.jit(
                    self._phase2_packed_raw, static_argnums=11
                )
                self._phase2_packed_width_argnum = 11
            else:
                self._phase2_packed_raw = jax.vmap(
                    phase2_packed,
                    in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, None),
                )
                self._phase2_packed = jax.jit(
                    self._phase2_packed_raw, static_argnums=9
                )
                self._phase2_packed_width_argnum = 9
        else:
            self._phase2_device = None
            self._phase2_packed = None

        def normalize_cloud(P):
            P = P - jnp.mean(P, axis=0)
            return P / jnp.maximum(
                jnp.max(jnp.linalg.norm(P, axis=1)), 1e-12
            )

        self._normalize_cloud = jax.jit(normalize_cloud)

        if mesh is None:
            # the ENTIRE cascade as one dispatch: global forward, patch
            # selection, greedy patch extraction (on-device while_loop),
            # LocalSPFN forward, and patch-major fast fusion. No host round
            # trip per cloud — essential on tunneled runtimes where each
            # synchronous dispatch costs a ~30 ms round trip, and the design
            # target for production serving (the host only uploads the cloud
            # and downloads the fused labels).
            from cpfn_tpu.eval.sampling import sample_patches_device
            from cpfn_tpu.merging.fusion import fuse_cascade_fast

            k_g2, k_l2 = self.n_max_global, self.n_max_local

            from cpfn_tpu.eval import ensemble

            n_runs = self.n_shuffles

            def cascade_device(lp, ls, gp, gs, P_hr, P_lr, pool_mask, key):
                k_glob, k_patch, key = jax.random.split(key, 3)

                # shuffled-order global forward (order-sensitivity, as in
                # global_fwd above), unshuffled before fusion/outputs; with
                # n_shuffles > 1 an in-graph ensemble over R permutations
                # (soft W averaged after relaxed-IoU slot alignment)
                def global_run(k):
                    gperm = jax.random.permutation(k, P_hr.shape[0])
                    ginv = jnp.argsort(gperm)
                    out, _ = apply_pointnet2(
                        gp, gs, global_model.cfg, P_hr[gperm][None],
                        train=False,
                    )
                    X_g, T_g, W_g = spfn_postprocess(out)
                    return (
                        X_g[0][ginv], T_g[0][ginv], W_g[0][ginv],
                        out["global_feat"][0], out["point_feat"][0][ginv],
                    )

                gkeys = jax.random.split(k_glob, n_runs)
                X_g, T_g, W_g, g_feat, p_feat = global_run(gkeys[0])
                if n_runs > 1:
                    acc = ensemble.init_accumulator((X_g, T_g, W_g))
                    for r in range(1, n_runs):
                        X1, T1, W1, gf1, pf1 = global_run(gkeys[r])
                        acc = ensemble.average_run(acc, (X1, T1, W1))
                        g_feat, p_feat = g_feat + gf1, p_feat + pf1
                    X_g, T_g, W_g = ensemble.finish_average(acc, n_runs)
                    g_feat, p_feat = g_feat / n_runs, p_feat / n_runs
                W_hard = hard_W_encoding(W_g[None])[0]

                idx, valid, count = sample_patches_device(
                    P_lr, P_hr, pool_mask, key,
                    num_points_patch=self.num_points_patch,
                    max_number_patches=self.max_patches,
                )
                mask = valid.astype(jnp.float32)
                # per-patch feature at the SEED point — captured BEFORE the
                # point-order shuffle permutes the index rows
                lkw = (
                    local_feature_kwargs(
                        g_feat, p_feat[idx[:, 0]], self.max_patches
                    )
                    if use_lfeat else {}
                )

                # point-order shuffle of the kNN-sorted patch index rows
                # (permuting an index row permutes points and scatter
                # targets coherently). R=1 fuses directly in the shuffled
                # order (exported patch_indices stay paired with the run's
                # outputs); R>1 maps each run back to the base row order so
                # the ensemble averages in a common order.
                pkeys = jax.random.split(k_patch, n_runs)
                if n_runs == 1:
                    pperm = jax.random.permutation(pkeys[0], idx.shape[1])
                    idx = idx[:, pperm]
                    patches = normalize_patches(P_hr, idx)
                    lout, _ = apply_pointnet2(
                        lp, ls, local_model.cfg, patches, train=False, **lkw
                    )
                    X_p, T_p, W_p = spfn_postprocess(lout)
                else:
                    def local_run(k):
                        pperm = jax.random.permutation(k, idx.shape[1])
                        pinv = jnp.argsort(pperm)
                        patches = normalize_patches(P_hr, idx[:, pperm])
                        lout, _ = apply_pointnet2(
                            lp, ls, local_model.cfg, patches, train=False,
                            **lkw,
                        )
                        X_p, T_p, W_p = spfn_postprocess(lout)
                        return X_p[:, pinv], T_p[:, pinv], W_p[:, pinv]

                    acc = ensemble.init_accumulator(local_run(pkeys[0]))
                    for r in range(1, n_runs):
                        acc = ensemble.average_run(acc, local_run(pkeys[r]))
                    X_p, T_p, W_p = ensemble.finish_average(acc, n_runs)
                W_f, X_f, T_f, n_valid = fuse_cascade_fast(
                    W_p, X_p, T_p, idx, W_hard, X_g, T_g,
                    k_g2, k_l2, out_width=self.out_width, patch_mask=mask,
                )
                # empty-pool fallback: the reference's global-only branch
                width = max(self.out_width, k_g2)
                W_glob = jnp.pad(W_hard, ((0, 0), (0, width - k_g2)))
                W_f = jnp.where(count > 0, W_f, W_glob)
                hard = jnp.argmax(W_f, axis=1).astype(jnp.int32)
                return {
                    "W": W_f, "X": X_f, "T": T_f, "hard": hard,
                    "global_W": W_hard, "global_X": X_g, "global_T": T_g,
                    "global_feat": g_feat,
                    "point_feat": p_feat,
                    "patch_indices": idx, "patch_valid": valid,
                    "n_patches": count, "n_clusters": n_valid,
                }

            def cascade_device_ps(lp, ls, gp, gs, pp_, ps_, P_hr, P_lr, key):
                """Patch pool from the patch-selection network (the full
                production path; `cascade_device` takes an explicit pool)."""
                k_ps, key = jax.random.split(key)
                psperm = jax.random.permutation(k_ps, P_lr.shape[0])
                psinv = jnp.argsort(psperm)
                pout, _ = apply_pointnet2(
                    pp_, ps_, patchselec_model.cfg,
                    normalize_cloud(P_lr)[psperm][None], train=False,
                )
                pool_mask = (
                    jnp.argmax(pout["heads"][0][0], axis=-1) == 1
                )[psinv]
                return cascade_device(lp, ls, gp, gs, P_hr, P_lr, pool_mask, key)

            self._cascade_device = jax.jit(cascade_device)
            self._cascade_device_ps = (
                jax.jit(cascade_device_ps)
                if patchselec_model is not None else None
            )
            # unjitted bodies, for wrapping under shard_map
            # (parallel.make_cloud_parallel_cascade)
            self._cascade_device_raw = cascade_device
            self._cascade_device_ps_raw = (
                cascade_device_ps if patchselec_model is not None else None
            )

            # Bucketed two-phase serving path (round 4): the single-dispatch
            # graph always runs the LocalSPFN stack at the padded width of
            # `max_patches`, but typical clouds extract ~6 patches — ~75% of
            # the dominant stage is wasted on padding. Phase 1 (global fwd
            # [+ patch selection] + on-device greedy extraction) is one
            # dispatch; the host then reads ONLY the patch count (one scalar;
            # the lookahead pipeline hides the sync) and dispatches phase 2
            # at the smallest compiled width that fits. Outputs are identical
            # to the full-width graph — phase 2 is width-polymorphic and
            # padding-invariant (tests/test_cascade_buckets.py).
            def phase1_device(gp, gs, P_hr, P_lr, pool_mask, key):
                k_glob, k_patch, key = jax.random.split(key, 3)
                # derive the permutation keys exactly as the R=1
                # single-dispatch graph does (split(k, n_runs)[0]) so the
                # bucketed path reproduces run_clouds_device bit-for-bit
                k_glob = jax.random.split(k_glob, 1)[0]
                k_patch = jax.random.split(k_patch, 1)[0]
                gperm = jax.random.permutation(k_glob, P_hr.shape[0])
                ginv = jnp.argsort(gperm)
                out, _ = apply_pointnet2(
                    gp, gs, global_model.cfg, P_hr[gperm][None], train=False
                )
                X_g, T_g, W_g = spfn_postprocess(out)
                X_g, T_g, W_g = X_g[0][ginv], T_g[0][ginv], W_g[0][ginv]
                W_hard = hard_W_encoding(W_g[None])[0]
                idx, valid, count = sample_patches_device(
                    P_lr, P_hr, pool_mask, key,
                    num_points_patch=self.num_points_patch,
                    max_number_patches=self.max_patches,
                )
                # point-order shuffle of the kNN-sorted index rows (the
                # order-sensitivity fix, as in cascade_device)
                p_feat = out["point_feat"][0][ginv]
                staged = {
                    "X_g": X_g, "T_g": T_g, "W_hard": W_hard,
                    "global_feat": out["global_feat"][0],
                    "point_feat": p_feat,
                    "mask": valid.astype(jnp.float32),
                    "count": count,
                }
                if use_lfeat:
                    # seed-point features, captured before the row shuffle
                    staged["loc_feat"] = p_feat[idx[:, 0]]
                pperm = jax.random.permutation(k_patch, idx.shape[1])
                staged["idx"] = idx[:, pperm]
                return staged

            def phase1_device_ps(gp, gs, pp_, ps_, P_hr, P_lr, key):
                k_ps, key = jax.random.split(key)
                psperm = jax.random.permutation(k_ps, P_lr.shape[0])
                psinv = jnp.argsort(psperm)
                pout, _ = apply_pointnet2(
                    pp_, ps_, patchselec_model.cfg,
                    normalize_cloud(P_lr)[psperm][None], train=False,
                )
                pool_mask = (
                    jnp.argmax(pout["heads"][0][0], axis=-1) == 1
                )[psinv]
                return phase1_device(gp, gs, P_hr, P_lr, pool_mask, key)

            self._phase1_device = jax.jit(phase1_device)
            self._phase1_device_ps = (
                jax.jit(phase1_device_ps)
                if patchselec_model is not None else None
            )
            # group-vmapped phase-1 graphs for the packed serving path:
            # one dispatch covers `group` clouds' global forwards +
            # extractions, and the stacked `count` output makes the
            # per-group patch-count fetch a single array transfer
            # raw (unjitted) vmapped bodies are kept for shard_map wrapping:
            # parallel.make_cloud_parallel_packed shards the group axis with
            # per-device programs (ZERO collectives by construction — GSPMD
            # partitioning of the same graphs inserts while-predicate
            # all-reduces and top_k all-gathers, tools/mesh_proof.py)
            self._phase1_batch_raw = jax.vmap(
                phase1_device, in_axes=(None, None, 0, 0, 0, 0)
            )
            self._phase1_batch = jax.jit(self._phase1_batch_raw)
            self._phase1_batch_ps_raw = (
                jax.vmap(
                    phase1_device_ps,
                    in_axes=(None, None, None, None, 0, 0, 0),
                )
                if patchselec_model is not None else None
            )
            self._phase1_batch_ps = (
                jax.jit(self._phase1_batch_ps_raw)
                if patchselec_model is not None else None
            )
        else:
            self._cascade_device = None
            self._cascade_device_ps = None
            self._cascade_device_raw = None
            self._cascade_device_ps_raw = None
            self._phase1_device = None
            self._phase1_device_ps = None
            self._phase1_batch = None
            self._phase1_batch_ps = None

    def select_pool(self, P_lr: jax.Array) -> np.ndarray:
        """PatchSelection heatmap -> pool indices into the low-res cloud."""
        m = self.patchselec_model
        labels = self._ps_fwd(
            m.params, m.state, self._normalize_cloud(P_lr), self._next_key()
        )
        return np.where(np.asarray(labels))[0]

    def _next_key(self):
        """Host-seeded key for the point-order shuffles in the jitted
        forwards (deterministic per Runner instance)."""
        return jax.random.PRNGKey(self._fwd_rng.randint(0, 2**31 - 1))

    def run_cloud(
        self,
        P_hr: np.ndarray,
        P_lr: np.ndarray,
        pool_indices: np.ndarray | None = None,
        rng: np.random.RandomState | None = None,
    ) -> dict:
        """Full cascade on one cloud.

        P_hr: [N, 3] high-res points (the model input resolution/noise level);
        P_lr: [n_lr, 3] low-res FPS subsample (preprocessing artifact).
        pool_indices: optional precomputed patch pool (GT-oracle mode,
        evaluation_PatchSelection.py scale>=1); otherwise the patch-selection
        network picks it.
        Returns dict with fused 'W' [N, K_out], 'X' [N, 3], 'T' [N, Q], the
        global stage outputs, and 'patch_indices'/'n_patches'. Array values
        are device-resident (jax arrays) — convert with np.asarray only what
        you need on the host.
        """
        staged = self._phase1(
            P_hr, P_lr if pool_indices is None else None
        )
        return self._phase2(staged, P_hr, P_lr, pool_indices, rng or np.random)

    # ------------------------------------------------------------------
    # pipelined multi-cloud execution
    # ------------------------------------------------------------------
    def _phase1(self, P_hr, P_lr):
        assert not self._use_lfeat, (
            "feature-injected LocalSPFN is wired through the device paths "
            "(run_clouds_device / bucketed / packed); the host-assembly and "
            "mesh patch-parallel paths do not thread glob/loc features yet"
        )
        """Dispatch the device-only front half (global fwd + heatmap) without
        forcing a host sync — JAX's async dispatch keeps the device busy
        while the host finishes the previous cloud. P_lr=None skips the
        patch-selection forward (caller supplies the pool)."""
        g = self.global_model
        P_hr_j = jnp.asarray(P_hr, jnp.float32)
        glob = self._global_fwd(g.params, g.state, P_hr_j, self._next_key())
        labels = None
        if self.patchselec_model is not None and P_lr is not None:
            m = self.patchselec_model
            labels = self._ps_fwd(
                m.params, m.state,
                self._normalize_cloud(jnp.asarray(P_lr, jnp.float32)),
                self._next_key(),
            )
        return {"P_hr_j": P_hr_j, "glob": glob, "ps_labels": labels}

    def _phase2(self, staged, P_hr, P_lr, pool_indices, rng):
        """Host patch extraction + local forward + fusion for one cloud."""
        X_g, T_g, W_hard, global_feat, point_feat = staged["glob"]
        P_hr_j = staged["P_hr_j"]
        if pool_indices is None:
            pool_indices = np.where(np.asarray(staged["ps_labels"]))[0]
        if len(pool_indices) > 0:
            patch_idx = sample_patches(
                P_lr, P_hr, pool_indices,
                num_points_patch=self.num_points_patch,
                max_number_patches=self.max_patches,
                rng=rng,
            )
        else:
            patch_idx = np.zeros((0, self.num_points_patch), np.int64)
        n_patches = patch_idx.shape[0]
        if n_patches > 0:
            # shuffle each patch's kNN-sorted index row (order-sensitivity:
            # permuting indices permutes points and scatter targets together)
            patch_idx = np.take_along_axis(
                patch_idx,
                np.argsort(self._fwd_rng.random(patch_idx.shape), axis=1),
                axis=1,
            )
            padded_idx = np.zeros(
                (self.max_patches, self.num_points_patch), np.int64
            )
            padded_idx[:n_patches] = patch_idx
            mask = np.zeros((self.max_patches,), np.float32)
            mask[:n_patches] = 1.0
            idx_j = jnp.asarray(padded_idx, jnp.int32)
            lm = self.local_model
            if self._phase2_device is not None:
                W_f, X_f, T_f, n_valid = self._phase2_device(
                    lm.params, lm.state, P_hr_j, idx_j,
                    jnp.asarray(mask), W_hard, X_g, T_g,
                )
            else:
                patches = self._normalize_patches(P_hr_j, idx_j)
                X_p, T_p, W_p = self._local_fwd(lm.params, lm.state, patches)
                W_f, X_f, T_f, n_valid = fuse_cascade(
                    W_p, X_p, T_p, idx_j, W_hard, X_g, T_g,
                    self.n_max_global, self.n_max_local,
                    patch_mask=mask, out_width=self.out_width,
                    return_counts=True,
                )
        else:
            n_valid = None
            W_f, X_f, T_f = fuse_cascade(
                np.zeros((0, self.num_points_patch, self.n_max_local), np.float32),
                np.zeros((0, self.num_points_patch, 3), np.float32),
                np.zeros((0, self.num_points_patch, T_g.shape[-1]), np.float32),
                np.zeros((0, self.num_points_patch), np.int64),
                W_hard, X_g, T_g,
                self.n_max_global, self.n_max_local,
                out_width=self.out_width,
            )
        return {
            "W": W_f, "X": X_f, "T": T_f,
            "global_W": W_hard, "global_X": X_g, "global_T": T_g,
            "global_feat": global_feat, "point_feat": point_feat,
            "patch_indices": patch_idx, "n_patches": n_patches,
            # surviving clusters before fixed-width compaction (device
            # scalar; > out_width means clusters were dropped — callers log)
            "n_clusters": n_valid,
        }

    def run_cloud_device(
        self,
        P_hr,
        P_lr,
        pool_mask=None,
        key=None,
    ) -> dict:
        """Single-dispatch all-device cascade on one cloud.

        pool_mask: [n_lr] bool patch pool (GT-oracle mode); None uses the
        patch-selection network. Returns device-resident arrays; 'hard' is
        the [N] fused hard segmentation (the cheap thing to materialize).
        """
        assert self._cascade_device is not None, "mesh mode: use run_cloud"
        key = key if key is not None else jax.random.PRNGKey(0)
        lm, gm = self.local_model, self.global_model
        P_hr = jnp.asarray(P_hr, jnp.float32)
        P_lr = jnp.asarray(P_lr, jnp.float32)
        if pool_mask is None:
            m = self.patchselec_model
            return self._cascade_device_ps(
                lm.params, lm.state, gm.params, gm.state,
                m.params, m.state, P_hr, P_lr, key,
            )
        return self._cascade_device(
            lm.params, lm.state, gm.params, gm.state,
            P_hr, P_lr, jnp.asarray(pool_mask, bool), key,
        )

    def run_cloud_bucketed(self, staged, buckets=(8, 16, 32), count=None):
        """Phase 2 of the bucketed path for one phase-1 result: read the
        patch count (the only host sync — pass `count` to reuse a batched
        fetch, see `run_clouds_bucketed`), pick the smallest bucket width
        that fits, and dispatch the width-polymorphic fused back half."""
        count = int(staged["count"]) if count is None else int(count)
        width = self.max_patches
        for b in sorted(buckets):
            if count <= b:
                width = min(b, self.max_patches)
                break
        lm = self.local_model
        W_hard, X_g, T_g = staged["W_hard"], staged["X_g"], staged["T_g"]
        feat = (
            (staged["global_feat"], staged["loc_feat"])
            if self._use_lfeat else ()
        )
        if count > 0:
            W_f, X_f, T_f, n_valid = self._phase2_device(
                lm.params, lm.state, staged["P_hr_j"],
                staged["idx"][:width], staged["mask"][:width],
                W_hard, X_g, T_g, *feat,
            )
        else:
            # the reference's global-only branch (empty patch pool)
            k_g = self.n_max_global
            out_w = max(self.out_width, k_g)
            W_f = jnp.pad(W_hard, ((0, 0), (0, out_w - k_g)))
            X_f, T_f, n_valid = X_g, T_g, None
        return {
            "W": W_f, "X": X_f, "T": T_f,
            "hard": jnp.argmax(W_f, axis=1).astype(jnp.int32),
            "global_W": W_hard, "global_X": X_g, "global_T": T_g,
            "global_feat": staged["global_feat"],
            "point_feat": staged["point_feat"],
            "patch_indices": staged["idx"], "patch_valid": staged["mask"],
            "n_patches": count, "n_clusters": n_valid,
            "bucket_width": width if count > 0 else 0,
        }

    def precompile_buckets(self, cloud, buckets=(8, 16, 32), key=None):
        """Compile phase 1 + phase 2 at every bucket width up front (one
        phase-1 dispatch, then one phase-2 execution per width on sliced
        padding) so the timed serving loop never hits a compile."""
        P_hr, P_lr, pool_mask = cloud
        key = key if key is not None else jax.random.PRNGKey(0)
        P_hr_j = jnp.asarray(P_hr, jnp.float32)
        P_lr_j = jnp.asarray(P_lr, jnp.float32)
        gm, lm = self.global_model, self.local_model
        if pool_mask is None:
            m = self.patchselec_model
            staged = self._phase1_device_ps(
                gm.params, gm.state, m.params, m.state, P_hr_j, P_lr_j, key
            )
        else:
            staged = self._phase1_device(
                gm.params, gm.state, P_hr_j, P_lr_j,
                jnp.asarray(pool_mask, bool), key,
            )
        feat = (
            (staged["global_feat"], staged["loc_feat"])
            if self._use_lfeat else ()
        )
        outs = []
        for b in sorted(set(min(b, self.max_patches) for b in buckets)):
            outs.append(self._phase2_device(
                lm.params, lm.state, P_hr_j,
                staged["idx"][:b], staged["mask"][:b],
                staged["W_hard"], staged["X_g"], staged["T_g"], *feat,
            ))
        # force materialization (block_until_ready is not a real barrier on
        # tunneled runtimes)
        for o in outs:
            np.asarray(o[0].ravel()[:1])

    def precompile_packed(
        self, cloud, group: int = 4, width: int = 8, buckets=(8, 16, 32),
        key=None,
    ):
        """Warm exactly the graph set the PACKED serving loop can reach,
        and nothing else: the group-vmapped phase 1 and phase 2, plus the
        per-cloud overflow phase-2 re-run at each bucket width strictly
        greater than `width` (overflow slices the packed staged arrays —
        see run_clouds_packed drain() — so the per-cloud phase-1 graph is
        unreachable from this path, and buckets <= width are never chosen
        by the overflow width search).

        `precompile_buckets` warms two graphs the packed loop never
        dispatches — per-cloud phase 1 (the largest single executable:
        full 100k global forward + extraction) and phase 2 at the packed
        width. On the tunneled runtime every extra executable load is
        minutes-scale with heavy variance (warmups measured 692 s and
        >1200 s for the identical committed cache set, 2026-08-21), so the
        driver-mode bench warms via this method instead.
        """
        P_hr, P_lr, pool_mask = cloud
        key = key if key is not None else jax.random.PRNGKey(0)
        group = max(1, int(group))
        width = min(int(width), self.max_patches)
        keys_ = jnp.stack(list(jax.random.split(key, group)))
        P_hr_g = jnp.asarray(
            np.broadcast_to(np.asarray(P_hr, np.float32),
                            (group,) + np.shape(P_hr)).copy()
        )
        P_lr_g = jnp.asarray(
            np.broadcast_to(np.asarray(P_lr, np.float32),
                            (group,) + np.shape(P_lr)).copy()
        )
        gm, lm = self.global_model, self.local_model
        lp, ls = lm.params, lm.state
        if pool_mask is None:
            pm = self.patchselec_model
            staged = self._phase1_batch_ps(
                gm.params, gm.state, pm.params, pm.state,
                P_hr_g, P_lr_g, keys_,
            )
        else:
            pool_g = jnp.asarray(
                np.broadcast_to(np.asarray(pool_mask, bool),
                                (group,) + np.shape(pool_mask)).copy()
            )
            staged = self._phase1_batch(
                gm.params, gm.state, P_hr_g, P_lr_g, pool_g, keys_
            )
        feat = (
            (staged["global_feat"], staged["loc_feat"])
            if self._use_lfeat else ()
        )
        outs = [self._phase2_packed(
            lp, ls, P_hr_g, staged["idx"], staged["mask"],
            staged["W_hard"], staged["X_g"], staged["T_g"], *feat,
            staged["count"], width,
        )]
        over_feat = tuple(f[0] for f in feat)
        for b in sorted(set(min(b, self.max_patches) for b in buckets)):
            if b <= width:
                continue
            outs.append(self._phase2_device(
                lp, ls, P_hr_g[0], staged["idx"][0, :b],
                staged["mask"][0, :b], staged["W_hard"][0],
                staged["X_g"][0], staged["T_g"][0], *over_feat,
            ))
        for o in outs:
            np.asarray(o[0].ravel()[:1])

    def run_clouds_bucketed(
        self, clouds, key=None, lag: int = 3, buckets=(8, 16, 32),
        group: int = 4,
    ):
        """Bucketed two-phase cascade over (P_hr, P_lr, pool_mask_or_None)
        tuples: phase 1 (global fwd + extraction) is dispatched for `group`
        clouds at a time, the host reads the whole group's patch counts in
        ONE stacked scalar transfer, and each cloud's phase 2 runs at the
        smallest compiled bucket width that fits — identical outputs to
        `run_clouds_device` at a fraction of the LocalSPFN compute on
        typical (few-patch) clouds.

        Grouping is the round-4 fix for the naive per-cloud `int(count)`
        sync: on the tunneled runtime one device->host read costs a full
        RTT that exceeded the compute phase 2 saves (measured 5.93 vs 9.02
        clouds/s). One group of phase-1 dispatches is kept in flight while
        the previous group's counts are fetched, so the device never
        drains during the read. `lag` is kept for API compatibility
        (group-lookahead subsumes it). R=1 only (the ensemble path stays
        on the single-dispatch graph)."""
        assert self.n_shuffles == 1, "bucketed path is single-forward (R=1)"
        assert self._phase1_device is not None, "mesh mode: use run_cloud"
        key = key if key is not None else jax.random.PRNGKey(0)
        group = max(1, int(group))
        gm = self.global_model

        def dispatch(cloud, sub):
            P_hr, P_lr, pool_mask = cloud
            P_hr = jnp.asarray(P_hr, jnp.float32)
            P_lr = jnp.asarray(P_lr, jnp.float32)
            if pool_mask is None:
                m = self.patchselec_model
                staged = self._phase1_device_ps(
                    gm.params, gm.state, m.params, m.state, P_hr, P_lr, sub
                )
            else:
                staged = self._phase1_device(
                    gm.params, gm.state, P_hr, P_lr,
                    jnp.asarray(pool_mask, bool), sub,
                )
            staged["P_hr_j"] = P_hr
            return staged

        def fetch_counts(staged_group):
            if not staged_group:
                return []
            if len(staged_group) == 1:
                return [int(staged_group[0]["count"])]
            # one stacked transfer for the whole group (the tiny concat
            # graph compiles once per distinct group length)
            return np.asarray(
                jnp.stack([s["count"] for s in staged_group])
            ).tolist()

        def drain(staged_group):
            for s, c in zip(staged_group, fetch_counts(staged_group)):
                yield self.run_cloud_bucketed(s, buckets, count=c)

        prev = []
        cur = []
        for cloud in clouds:
            key, sub = jax.random.split(key)
            cur.append(dispatch(cloud, sub))
            if len(cur) == group:
                yield from drain(prev)
                prev, cur = cur, []
        yield from drain(prev)
        yield from drain(cur)

    def run_clouds_packed(
        self, clouds, key=None, group: int = 4, width: int = 8,
        buckets=(8, 16, 32), sharding=None, graphs=None,
    ):
        """PACKED serving path (round 4): phase 1 for `group` clouds in ONE
        vmapped dispatch, one stacked patch-count transfer per group, then
        ONE vmapped phase-2 dispatch at `width` covering every cloud whose
        patch count fits; overflow clouds (count > width) re-run phase 2
        individually at the smallest bucket width that fits and their
        packed-row results are discarded.

        This attacks BOTH measured costs of the per-cloud paths at once:
        the padded LocalSPFN compute (the single-dispatch graph always pays
        the `max_patches`-wide stack; measured clouds average ~6.3 patches)
        and the per-dispatch tunnel overhead that made the per-cloud
        bucketed path a regression (5.3 vs 9.4 clouds/s — see
        tools/bucket_diag.py and PERF.md round 4). Device ops per group:
        1 phase-1 + 1 phase-2 + 1 stacked count read + 1 stacked hard-label
        transfer (vs 3+ dispatches per CLOUD bucketed).

        Fused outputs (W/X/T/hard) are bit-identical to run_clouds_device —
        per-cloud keys derive identically, phase 2 is width-polymorphic and
        padding-invariant (tests/test_cascade_packed.py). One group is kept
        in flight while the previous group drains. R=1 only. Yields results
        in input order; `hard` rows are host numpy (already transferred).

        `sharding`: optional jax.sharding.Sharding for the group axis (e.g.
        NamedSharding(mesh, P("dp")) from make_cloud_parallel_packed). The
        stacked per-group inputs are placed on it and GSPMD partitions both
        vmapped graphs across the mesh — no cross-cloud communication
        exists, so this is zero-collective cloud parallelism: each chip runs
        group/n_chips clouds of every packed dispatch. `group` must then be
        a multiple of the device count."""
        assert self.n_shuffles == 1, "packed path is single-forward (R=1)"
        assert self._phase1_batch is not None, "mesh mode: use run_cloud"
        key = key if key is not None else jax.random.PRNGKey(0)
        group = max(1, int(group))
        if sharding is not None and group % len(sharding.device_set):
            raise ValueError(
                f"group {group} not divisible by the sharding's "
                f"{len(sharding.device_set)} devices"
            )
        width = min(int(width), self.max_patches)
        # `graphs`: optional {"phase1", "phase1_ps", "phase2"} overrides —
        # parallel.make_cloud_parallel_packed passes shard_map-wrapped
        # versions whose per-device programs are collective-free by
        # construction (tools/mesh_proof.py pins it)
        p1_fn = (graphs or {}).get("phase1", self._phase1_batch)
        p1ps_fn = (graphs or {}).get("phase1_ps", self._phase1_batch_ps)
        p2_fn = (graphs or {}).get("phase2", self._phase2_packed)
        gm, lm, pm = self.global_model, self.local_model, self.patchselec_model
        gp, gs, lp, ls = gm.params, gm.state, lm.params, lm.state
        pp, ps_ = (pm.params, pm.state) if pm is not None else (None, None)
        if sharding is not None:
            # checkpoint-loaded params are committed to one device; the
            # sharded group inputs span the mesh — replicate the weights
            # onto the mesh once (a NamedSharding is required here) or jit
            # rejects the device mix
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(sharding.mesh, PartitionSpec())
            gp, gs, lp, ls = jax.device_put((gp, gs, lp, ls), rep)
            if pm is not None:
                pp, ps_ = jax.device_put((pp, ps_), rep)

        def stack_group(arrs, dtype):
            # Stack the group axis ON HOST when the inputs are host arrays
            # (the serving/bench case): one device transfer for the whole
            # [G, ...] operand. The original per-cloud `jnp.asarray` +
            # `jnp.stack` paid a tunnel round trip PER CLOUD PER OPERAND —
            # the measured 53 ms/cloud (bucket_diag, staged inputs) vs
            # 142 ms/cloud (end-to-end bench) round-4 contradiction.
            if all(isinstance(a, np.ndarray) for a in arrs):
                return np.stack([a.astype(dtype, copy=False) for a in arrs])
            return jnp.stack([jnp.asarray(a, dtype) for a in arrs])

        def dispatch(batch):
            # batch: [((P_hr, P_lr, pool_or_None), sub_key)] * <=group;
            # short tail groups are padded by repeating the first entry so
            # one (group, ...) executable serves every dispatch — padded
            # rows are dropped at drain time
            n = len(batch)
            full = batch + [batch[0]] * (group - n)
            P_hr = stack_group([c[0][0] for c in full], np.float32)
            P_lr = stack_group([c[0][1] for c in full], np.float32)
            keys_ = jnp.stack([c[1] for c in full])
            # one async upload per operand (P_hr is consumed by BOTH phase
            # graphs — without the explicit put, each jit would transfer
            # the host array separately)
            P_hr = jax.device_put(P_hr, sharding)
            P_lr = jax.device_put(P_lr, sharding)
            if sharding is not None:
                keys_ = jax.device_put(keys_, sharding)
            if full[0][0][2] is None:
                staged = p1ps_fn(
                    gp, gs, pp, ps_, P_hr, P_lr, keys_,
                )
            else:
                pool = stack_group([c[0][2] for c in full], bool)
                if sharding is not None:
                    pool = jax.device_put(pool, sharding)
                staged = p1_fn(
                    gp, gs, P_hr, P_lr, pool, keys_
                )
            return staged, P_hr, n

        def drain(batch):
            if batch is None:
                return
            staged, P_hr, n = batch
            # dispatch phase 2 FIRST — it does not depend on the host-side
            # counts — so the count round trip overlaps phase-2 compute
            if self._use_lfeat:
                W_f, X_f, T_f, n_valid, hard = p2_fn(
                    lp, ls, P_hr,
                    staged["idx"], staged["mask"],
                    staged["W_hard"], staged["X_g"], staged["T_g"],
                    staged["global_feat"], staged["loc_feat"],
                    staged["count"], width,
                )
            else:
                W_f, X_f, T_f, n_valid, hard = p2_fn(
                    lp, ls, P_hr,
                    staged["idx"], staged["mask"],
                    staged["W_hard"], staged["X_g"], staged["T_g"],
                    staged["count"], width,
                )
            try:
                hard.copy_to_host_async()
            except AttributeError:
                pass
            counts = np.asarray(staged["count"])[:n].astype(int).tolist()
            hard_np = np.asarray(hard)[:n]  # one [G, N] transfer per group
            for i in range(n):
                c = counts[i]
                if c <= width:
                    out = {
                        "W": W_f[i], "X": X_f[i], "T": T_f[i],
                        "hard": hard_np[i], "n_clusters": n_valid[i],
                        "bucket_width": width if c > 0 else 0,
                    }
                else:
                    w2 = self.max_patches
                    for b in sorted(buckets):
                        if c <= b:
                            w2 = min(b, self.max_patches)
                            break
                    over = (
                        P_hr[i], staged["idx"][i, :w2],
                        staged["mask"][i, :w2], staged["W_hard"][i],
                        staged["X_g"][i], staged["T_g"][i],
                    )
                    if self._use_lfeat:
                        over = over + (
                            staged["global_feat"][i], staged["loc_feat"][i],
                        )
                    if sharding is not None:
                        # per-cloud slices of mesh-sharded arrays land on
                        # single devices; host-materialize so the re-run
                        # (rare) stays device-compatible with the
                        # replicated weights
                        over = tuple(np.asarray(a) for a in over)
                    Wf1, Xf1, Tf1, nv1 = self._phase2_device(lp, ls, *over)
                    out = {
                        "W": Wf1, "X": Xf1, "T": Tf1,
                        "hard": np.asarray(
                            jnp.argmax(Wf1, axis=1).astype(jnp.int32)
                        ),
                        "n_clusters": nv1, "bucket_width": w2,
                    }
                out.update(
                    global_W=staged["W_hard"][i],
                    global_X=staged["X_g"][i],
                    global_T=staged["T_g"][i],
                    global_feat=staged["global_feat"][i],
                    point_feat=staged["point_feat"][i],
                    patch_indices=staged["idx"][i],
                    patch_valid=staged["mask"][i],
                    n_patches=c,
                )
                yield out

        prev = None
        cur = []
        for cloud in clouds:
            key, sub = jax.random.split(key)
            cur.append((cloud, sub))
            if len(cur) == group:
                nxt = dispatch(cur)
                yield from drain(prev)
                prev, cur = nxt, []
        if cur:
            nxt = dispatch(cur)
            yield from drain(prev)
            prev = nxt
        yield from drain(prev)

    def run_clouds_device(self, clouds, key=None, lag: int = 3):
        """Pipelined all-device cascade over (P_hr, P_lr, pool_mask_or_None)
        tuples: keeps `lag` clouds in flight (pure async dispatch — there is
        no host work to overlap, only upload/execute/download)."""
        import collections

        key = key if key is not None else jax.random.PRNGKey(0)
        pending = collections.deque()
        for cloud in clouds:
            key, sub = jax.random.split(key)
            pending.append(self.run_cloud_device(*cloud, key=sub))
            if len(pending) > lag:
                yield pending.popleft()
        while pending:
            yield pending.popleft()

    def run_clouds(self, clouds, rng: np.random.RandomState | None = None):
        """Software-pipelined cascade over an iterable of
        (P_hr, P_lr, pool_indices_or_None): cloud i+1's device front half is
        dispatched before cloud i's host-side back half runs, overlapping
        host work and device compute. Yields per-cloud result dicts."""
        rng = rng or np.random
        staged = None
        for cloud in clouds:
            cur = (cloud, self._phase1(cloud[0], cloud[1]))
            if staged is not None:
                (p_hr, p_lr, pool), st = staged
                yield self._phase2(st, p_hr, p_lr, pool, rng)
            staged = cur
        if staged is not None:
            (p_hr, p_lr, pool), st = staged
            yield self._phase2(st, p_hr, p_lr, pool, rng)
