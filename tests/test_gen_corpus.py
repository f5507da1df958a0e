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


def test_patch_selection_dataset_preload_equivalence(tmp_path):
    """preload=True must yield records identical to the lazy path (same seed:
    the per-access shuffle stream is unchanged by caching)."""
    from cpfn_tpu.data.dataset import PatchSelectionDataset
    from cpfn_tpu.preprocess import lowres as pre_lowres

    out = str(tmp_path / "c")
    gen_corpus.main([
        "--out", out, "--n_train", "2", "--n_test", "1",
        "--n_points", "2000", "--min_instances", "3", "--max_instances", "3",
        "--min_small", "1", "--max_small", "1", "--seed", "3",
    ])
    lr_dir = str(tmp_path / "lr")
    pre_lowres.main([
        "--path_highres", os.path.join(out, "highres"),
        "--path_lowres", lr_dir,
        "--path_split_file", os.path.join(out, "Dataset", "train_models.csv"),
        "--nb_query_points", "256", "--n_jobs", "1",
    ])
    with open(os.path.join(out, "Dataset", "train_models.csv")) as f:
        names = [l.strip() for l in f if l.strip()]
    lr = [os.path.join(lr_dir, n) for n in names]
    hr = [os.path.join(out, "highres", n) for n in names]
    kw = dict(scale=0.05, n_points=None, seed=11)
    lazy = PatchSelectionDataset(lr, hr, **kw)
    pre = PatchSelectionDataset(lr, hr, preload=True, **kw)
    for i in range(len(lazy)):
        a, b = lazy[i], pre[i]
        for k in ("P", "labels", "unshuffle"):
            np.testing.assert_array_equal(a[k], b[k])
    # second access hits the cache and still matches the lazy stream
    for k in ("P", "labels", "unshuffle"):
        np.testing.assert_array_equal(lazy[0][k], pre[0][k])


def test_verify_corpus_detects_zero_page_corruption(tmp_path, capsys):
    """Hard host resets leave zero-filled pages in unflushed h5 files
    (metadata survives, data blocks don't). verify_corpus must flag and
    delete exactly those files so the deterministic generator re-derives
    them on the next resume pass."""
    import h5py

    from cpfn_tpu.data import verify_corpus

    out = str(tmp_path / "corpus")
    gen_corpus.main([
        "--out", out, "--n_train", "3", "--n_test", "0",
        "--n_points", "2000", "--min_instances", "3", "--max_instances", "3",
        "--min_small", "1", "--max_small", "1", "--seed", "3",
    ])
    hr = os.path.join(out, "highres")
    names = sorted(os.listdir(hr))
    assert verify_corpus.check_file(os.path.join(hr, names[0])) is None

    # simulate a lost data page: zero out gt_points rows
    with h5py.File(os.path.join(hr, names[1]), "r+") as f:
        pts = f["gt_points"][()]
        pts[100:500] = 0.0
        f["gt_points"][...] = pts
    # and a torn file: truncate to half size
    p2 = os.path.join(hr, names[2])
    data = open(p2, "rb").read()
    open(p2, "wb").write(data[: len(data) // 2])

    assert verify_corpus.check_file(os.path.join(hr, names[1])) is not None
    assert verify_corpus.check_file(p2) is not None

    import sys

    argv = sys.argv
    sys.argv = ["verify_corpus", hr, "--delete"]
    try:
        verify_corpus.main()
    finally:
        sys.argv = argv
    left = sorted(os.listdir(hr))
    assert left == [names[0]]
