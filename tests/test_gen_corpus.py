"""gen_corpus CLI: TraceParts-layout corpus generation
(cf. reference dataset layout consumed by
`Preprocessing/preprocessing_sampling_lowres.py`)."""

import os

import numpy as np

from cpfn_tpu.data import gen_corpus
from cpfn_tpu.data.hdf5 import read_spfn_hdf5
from cpfn_tpu.fitting import factory


def _read(path):
    factory.register_primitives(["sphere", "plane", "cylinder", "cone"])
    return read_spfn_hdf5(path, n_max_instances=8, noisy=False)


def test_gen_corpus_layout_and_resume(tmp_path):
    out = str(tmp_path / "corpus")
    args = [
        "--out", out, "--n_train", "3", "--n_test", "2",
        "--n_points", "3000", "--min_instances", "3", "--max_instances", "4",
        "--min_small", "1", "--max_small", "2", "--seed", "7",
    ]
    gen_corpus.main(args)

    with open(os.path.join(out, "Dataset", "train_models.csv")) as f:
        train_names = [l.strip() for l in f if l.strip()]
    with open(os.path.join(out, "Dataset", "test_models.csv")) as f:
        test_names = [l.strip() for l in f if l.strip()]
    assert len(train_names) == 3 and len(test_names) == 2
    assert set(train_names).isdisjoint(test_names)

    # every listed file exists and round-trips through the TraceParts reader
    path0 = os.path.join(out, "highres", train_names[0])
    rec = _read(path0)
    assert rec["P"].shape == (3000, 3)
    assert rec["I_gt"].max() >= 0

    # resume: re-invoking keeps existing files byte-identical (per-cloud RNG
    # streams; nothing is regenerated)
    before = open(path0, "rb").read()
    gen_corpus.main(args)
    assert open(path0, "rb").read() == before

    # different clouds differ
    a = _read(path0)["P"]
    b = _read(os.path.join(out, "highres", train_names[1]))["P"]
    assert not np.array_equal(a, b)
