"""Data pipeline tests (reference: neuronika-data/src/test.rs, 12 tests)."""

import numpy as np
import pytest

from neuronika_tpu import data
from tests.conftest import assert_close

CSV = "a,b,c\n1,2,3\n4,5,6\n7,8,9\n10,11,12"
CSV_LABELED = (
    "Paw_size,Tail_length,Weight,Animal\n"
    "0.2,5.0,15.0,1\n"
    "0.08,12.0,4.0,2\n"
    "0.07,13.0,5.0,2\n"
    "0.05,3.0,0.8,3"
)


def test_from_reader_golden():
    ds = data.DataLoader.default().from_reader(CSV, 3)
    assert ds.len() == 4
    assert_close(ds.records(), np.arange(1.0, 13.0).reshape(4, 3))


def test_without_headers():
    ds = data.DataLoader.default().without_headers().from_reader("1,2\n3,4", 2)
    assert ds.len() == 2
    assert_close(ds.records(), [[1.0, 2.0], [3.0, 4.0]])


def test_with_delimiter():
    ds = (
        data.DataLoader.default()
        .without_headers()
        .with_delimiter(";")
        .from_reader("1;2\n3;4", 2)
    )
    assert_close(ds.records(), [[1.0, 2.0], [3.0, 4.0]])


def test_labeled_loader_splits_columns():
    ds = data.DataLoader.default().with_labels([3]).from_reader(CSV_LABELED, 3, 1)
    assert ds.records().shape == (4, 3)
    assert ds.labels().shape == (4, 1)
    assert_close(ds.labels()[:, 0], [1.0, 2.0, 2.0, 3.0])
    assert_close(ds.records()[0], [0.2, 5.0, 15.0])


def test_from_reader_fn_mapping():
    csv = "x,y,animal\n1,2,Dog\n3,4,Cat"
    mapping = {"Dog": 1.0, "Cat": 2.0}

    def mapper(pair):
        rec, label = pair
        return rec, [mapping.get(label, 3.0)]

    ds = data.DataLoader.default().with_labels([2]).from_reader_fn(csv, 2, 1, mapper)
    assert_close(ds.records(), [[1.0, 2.0], [3.0, 4.0]])
    assert_close(ds.labels(), [[1.0], [2.0]])


def test_batch_and_drop_last():
    ds = data.DataLoader.default().from_reader(CSV, 3)
    batches = list(ds.batch(3))
    assert len(batches) == 2
    assert batches[0].shape == (3, 3)
    assert batches[1].shape == (1, 3)
    dropped = list(ds.batch(3).drop_last())
    assert len(dropped) == 1


def test_labeled_batch():
    ds = data.DataLoader.default().with_labels([3]).from_reader(CSV_LABELED, 3, 1)
    for x, y in ds.batch(2):
        assert x.shape[0] == y.shape[0]


def test_shuffle_with_seed_deterministic():
    ds1 = data.DataLoader.default().from_reader(CSV, 3)
    ds2 = data.DataLoader.default().from_reader(CSV, 3)
    ds1.shuffle_with_seed(42)
    ds2.shuffle_with_seed(42)
    assert_close(ds1.records(), ds2.records())
    # rows are permuted, not mangled
    assert sorted(ds1.records()[:, 0].tolist()) == [1.0, 4.0, 7.0, 10.0]


def test_labeled_shuffle_keeps_pairs():
    ds = data.DataLoader.default().with_labels([3]).from_reader(CSV_LABELED, 3, 1)
    before = {tuple(r): l[0] for r, l in zip(ds.records(), ds.labels())}
    ds.shuffle_with_seed(7)
    after = {tuple(r): l[0] for r, l in zip(ds.records(), ds.labels())}
    assert before == after


def test_split():
    ds = data.DataLoader.default().from_reader(CSV, 3)
    parts = ds.split([1, 3])
    assert [p.len() for p in parts] == [1, 3]
    assert_close(parts[0].records(), [[1.0, 2.0, 3.0]])
    with pytest.raises(ValueError):
        ds.split([1, 1])


def test_kfold_contents():
    ds = data.DataLoader.default().from_reader(CSV, 3)
    folds = list(ds.kfold(2))
    assert len(folds) == 2
    train, test = folds[0]
    assert test.shape == (2, 3)
    assert train.shape == (2, 3)
    assert_close(test, ds.records()[:2])
    assert_close(train, ds.records()[2:])


def test_kfold_validation():
    ds = data.DataLoader.default().from_reader(CSV, 3)
    with pytest.raises(ValueError):
        ds.kfold(1)
    with pytest.raises(ValueError):
        ds.kfold(10)


def test_labeled_kfold():
    ds = data.DataLoader.default().with_labels([3]).from_reader(CSV_LABELED, 3, 1)
    (tr, te) = list(ds.kfold(2))[0]
    (tr_r, tr_l), (te_r, te_l) = tr, te
    assert tr_r.shape[0] == tr_l.shape[0] == 2
    assert te_r.shape[0] == te_l.shape[0] == 2


def test_set_kfold_reference_math():
    # reference SetKFold (lib.rs:685-720): step = 1 + (len-1)//k, fold i =
    # [step*i, min(len, step*i+step)) — len=10, k=3 gives folds 4,4,2.
    src = np.arange(20.0).reshape(10, 2).astype(np.float32)
    kf = data.SetKFold(src, 3)
    tr, te = kf.compute_fold(0)
    assert te.shape == (4, 2) and tr.shape == (6, 2)
    assert_close(te, src[:4])
    tr, te = kf.compute_fold(2)
    assert te.shape == (2, 2) and tr.shape == (8, 2)
    assert_close(te, src[8:])
    with pytest.raises(ValueError):
        data.SetKFold(src, 1)


def test_labeled_split():
    ds = data.DataLoader.default().with_labels([3]).from_reader(CSV_LABELED, 3, 1)
    a, b = ds.split([3, 1])
    assert a.len() == 3 and b.len() == 1


def test_from_csv_file_roundtrip(tmp_path):
    """File-based loading (exercises the native C++ fast path when built,
    pure-Python parser otherwise)."""
    path = str(tmp_path / "data.csv")
    with open(path, "w") as f:
        f.write("a,b,c\n1,2,3\n4,5,6\n7,8,9\n")
    ds = data.DataLoader.default().from_csv(path, 3)
    assert_close(ds.records(), np.arange(1.0, 10.0).reshape(3, 3))


def test_prefetch_to_device():
    ds = data.DataLoader.default().from_reader(CSV, 3)
    batches = list(data.prefetch_to_device(ds.batch(2), size=2))
    assert len(batches) == 2
    assert_close(np.concatenate([np.asarray(b) for b in batches]), ds.records())
    # labeled tuples survive
    lds = data.DataLoader.default().with_labels([3]).from_reader(CSV_LABELED, 3, 1)
    for x, y in data.prefetch_to_device(lds.batch(2)):
        assert np.asarray(x).shape[0] == np.asarray(y).shape[0]


class TestLmWindows:
    def test_windows_and_targets(self):
        import numpy as np

        from neuronika_tpu.data import lm_windows

        ids = np.arange(100)
        t, g = lm_windows(ids, 10)
        assert t.shape == g.shape == (9, 10)
        assert (g == t + 1).all()          # next-token alignment
        assert (t[0] == np.arange(10)).all()
        assert (t[1] == np.arange(10, 20)).all()

    def test_stride_overlap(self):
        import numpy as np

        from neuronika_tpu.data import lm_windows

        t, g = lm_windows(np.arange(50), 16, stride=8)
        assert (t[1][:8] == t[0][8:]).all()   # half-window overlap

    def test_too_short_raises(self):
        import pytest as _pytest

        from neuronika_tpu.data import lm_windows

        with _pytest.raises(ValueError, match="shorter than one"):
            lm_windows(list(range(8)), 16)
