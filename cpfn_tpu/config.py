"""YAML configuration system (cf. `Utils/config_loader.py`).

Reads the same YAML schema as the reference's Configs/*.yml (so existing
config files port over unchanged) into typed dataclasses, and maps onto the
framework's model/train configs.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import yaml

from cpfn_tpu.nn import PointNet2Config
from cpfn_tpu.train.steps import SPFNTrainConfig


@dataclasses.dataclass
class Config:
    batch_size: int = 16
    train_data_file: str = "train_models.csv"
    train_first_n: int = -1
    # rotate the staged subset: skip this many records before taking
    # `train_first_n` (wraps around the corpus). Lets device-resident runs
    # cycle shards of a corpus larger than the HBM staging budget across
    # resume segments.
    train_skip_n: int = 0
    train_data_noisy: bool = True
    train_workers: int = 4
    val_data_file: str = "test_models.csv"
    val_first_n: int = -1
    val_data_noisy: bool = True
    val_workers: int = 4
    test_data_file: str = "test_models.csv"
    test_first_n: int = -1
    test_data_noisy: bool = True
    n_epochs: int = 100
    bn_decay_step: int = 200000
    decay_step: int = 200000
    decay_rate: float = 0.7
    init_learning_rate: float = 1e-3
    val_interval: int = 5
    snapshot_interval: int = 100
    visualisation_interval: int = 50
    weights_folder: str = "trained_models"
    # loss multipliers (SPFN configs)
    miou_loss_multiplier: float = 1.0
    normal_loss_multiplier: float = 1.0
    type_loss_multiplier: float = 1.0
    parameter_loss_multiplier: float = 1.0
    residue_loss_multiplier: float = 1.0
    total_loss_multiplier: float = 1.0
    # global-norm gradient clip (TPU-native addition; 0 = off, the
    # reference's behavior)
    grad_clip_norm: float = 0.0
    list_of_primitives: Sequence[str] = (
        "sphere", "plane", "cylinder", "cone",
    )
    n_max_global_instances: int = 28
    n_max_local_instances: int = 21
    # TPU-native additions
    n_devices: int = 0  # 0 = all available
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "logs"
    profile_dir: str = ""  # set to enable jax.profiler traces
    # PointNet2Config field overrides (e.g. smaller sa1_points for tiny runs)
    model_overrides: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        raw.pop("CUDA_visible_GPUs", None)  # reference key, meaningless here
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
        return cls(**raw)

    def model_config(
        self, network: str, scale_kwargs: dict | None = None
    ) -> PointNet2Config:
        """Network head layout per driver (training_SPFN.py:66-71,
        training_PatchSelection.py:55)."""
        q = len(self.list_of_primitives)
        if network == "GlobalSPFN":
            sizes = (3, q, self.n_max_global_instances)
        elif network == "LocalSPFN":
            sizes = (3, q, self.n_max_local_instances)
        elif network == "PatchSelection":
            sizes = (2,)
        else:
            raise ValueError(network)
        kwargs = dict(self.model_overrides)
        kwargs.update(scale_kwargs or {})
        # YAML lists -> tuples for the frozen dataclass
        kwargs = {
            k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()
        }
        return PointNet2Config(output_sizes=sizes, **kwargs)

    def train_config(self) -> SPFNTrainConfig:
        return SPFNTrainConfig(
            batch_size=self.batch_size,
            init_learning_rate=self.init_learning_rate,
            decay_step=self.decay_step,
            decay_rate=self.decay_rate,
            bn_decay_step=self.bn_decay_step,
            miou_loss_multiplier=self.miou_loss_multiplier,
            normal_loss_multiplier=self.normal_loss_multiplier,
            type_loss_multiplier=self.type_loss_multiplier,
            parameter_loss_multiplier=self.parameter_loss_multiplier,
            residue_loss_multiplier=self.residue_loss_multiplier,
            total_loss_multiplier=self.total_loss_multiplier,
            grad_clip_norm=self.grad_clip_norm,
            classes=tuple(self.list_of_primitives),
        )
