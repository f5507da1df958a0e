from cpfn_tpu.data.synthetic import (
    SyntheticSceneConfig,
    make_synthetic_scene,
    make_synthetic_batch,
    write_scene_hdf5,
)
from cpfn_tpu.data.hdf5 import (
    parse_spfn_record,
    parse_patch_selection_record,
    read_spfn_hdf5,
)
from cpfn_tpu.data.dataset import (
    GlobalSPFNDataset,
    PatchSelectionDataset,
    TrainLocalSPFNDataset,
    batch_iterator,
)

__all__ = [
    "SyntheticSceneConfig",
    "make_synthetic_scene",
    "make_synthetic_batch",
    "write_scene_hdf5",
    "parse_spfn_record",
    "parse_patch_selection_record",
    "read_spfn_hdf5",
    "GlobalSPFNDataset",
    "PatchSelectionDataset",
    "TrainLocalSPFNDataset",
    "batch_iterator",
]
