"""High-level model API: the three CPFN model families as one-line
constructors bundling config + params + BN state, with call/save/load.

The functional core stays in `cpfn_tpu.nn`; this wrapper is the friendly
entry point mirroring the reference's driver-level model construction
(`training_SPFN.py:66-71`, `training_PatchSelection.py:55`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

from cpfn_tpu.nn import PointNet2Config, apply_pointnet2, init_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess


@dataclasses.dataclass
class SPFNModel:
    cfg: PointNet2Config
    params: Any
    state: Any

    # ------------------------------------------------------------ factories
    @classmethod
    def create(cls, key: jax.Array, cfg: PointNet2Config) -> "SPFNModel":
        params, state = init_pointnet2(key, cfg)
        return cls(cfg, params, state)

    # --------------------------------------------------------------- apply
    def __call__(
        self,
        points,
        *,
        train: bool = False,
        rng: jax.Array | None = None,
        bn_momentum=0.5,
        glob_features=None,
        loc_features=None,
        update_state: bool = False,
    ):
        """Forward pass. Returns the outputs dict; with update_state=True the
        bundled BN state is replaced by the post-batch statistics (training
        loops should instead use `cpfn_tpu.train.make_spfn_train_step`)."""
        out, new_state = apply_pointnet2(
            self.params, self.state, self.cfg, points,
            train=train, rng=rng, bn_momentum=bn_momentum,
            glob_features=glob_features, loc_features=loc_features,
        )
        if update_state:
            self.state = new_state
        return out

    def predict(self, points):
        """Eval forward with SPFN post-processing: (X unit normals, T type
        logits, W softmax membership)."""
        return spfn_postprocess(self(points, train=False))

    # ----------------------------------------------------------- persistence
    def save(self, directory: str, step: int = 0) -> None:
        from cpfn_tpu.utils import save_checkpoint

        save_checkpoint(directory, step, self.params, self.state)

    def load(self, directory: str, step: int | None = None) -> "SPFNModel":
        from cpfn_tpu.utils import restore_checkpoint

        restored, _ = restore_checkpoint(
            directory, {"params": self.params, "state": self.state}, step
        )
        self.params, self.state = restored["params"], restored["state"]
        return self


def GlobalSPFN(
    key: jax.Array, n_types: int = 4, n_max_instances: int = 28, **overrides
) -> SPFNModel:
    """Heads: [normals 3, type logits Q, membership K_global]."""
    cfg = PointNet2Config(
        output_sizes=(3, n_types, n_max_instances), **overrides
    )
    return SPFNModel.create(key, cfg)


def LocalSPFN(
    key: jax.Array,
    n_types: int = 4,
    n_max_instances: int = 21,
    use_features: bool = False,
    **overrides,
) -> SPFNModel:
    """Per-patch SPFN; `use_features=True` injects the GlobalSPFN global code
    and per-patch feature (the reference ships the feature-free config)."""
    cfg = PointNet2Config(
        output_sizes=(3, n_types, n_max_instances),
        use_glob_features=use_features,
        use_loc_features=use_features,
        **overrides,
    )
    return SPFNModel.create(key, cfg)


def PatchSelectionNet(key: jax.Array, **overrides) -> SPFNModel:
    """Binary per-point small-primitive classifier."""
    cfg = PointNet2Config(output_sizes=(2,), **overrides)
    return SPFNModel.create(key, cfg)
