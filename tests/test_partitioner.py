"""Partitioner: build correctness, ordering, batching, masking utilities."""

import numpy as np
import pytest

from cvmatrix_tpu import Partitioner


def test_build_matches_naive_loop():
    rng = np.random.default_rng(0)
    folds = rng.choice([5, 2, 9, 2.5], size=1000)
    p = Partitioner(folds)
    # Naive reference: insertion-order dict of appended indices.
    ref = {}
    for i, f in enumerate(folds):
        ref.setdefault(f, []).append(i)
    assert list(p.folds_dict.keys()) == list(ref.keys())  # first-appearance order
    for k in ref:
        np.testing.assert_array_equal(p.get_validation_indices(k), ref[k])
        assert p.folds_dict[k].dtype == np.dtype(int)


def test_build_from_generic_iterable():
    folds = ["a", "b", "a", "c", "b", "a"]
    p = Partitioner(folds)
    assert list(p.folds_dict.keys()) == ["a", "b", "c"]
    np.testing.assert_array_equal(p.get_validation_indices("a"), [0, 2, 5])
    np.testing.assert_array_equal(p.get_validation_indices("c"), [3])


def test_unknown_fold_raises():
    p = Partitioner(np.array([0, 1, 0]))
    with pytest.raises(ValueError, match="Fold 7 not found."):
        p.get_validation_indices(7)


def test_size_buckets():
    folds = np.array([0] * 3 + [1] * 3 + [2] * 5)
    p = Partitioner(folds)
    buckets = dict()
    for ks, batch in p.size_buckets():
        buckets[batch.shape[1]] = (ks, batch)
    assert set(buckets) == {3, 5}
    ks3, b3 = buckets[3]
    assert ks3 == [0, 1] and b3.shape == (2, 3)


def test_padded_batches_equal_sizes_no_mask():
    p = Partitioner(np.arange(10) % 5)
    keys, idx, mask = p.padded_batches()
    assert mask is None and idx.shape == (5, 2)


def test_padded_batches_mask():
    folds = np.array([0] * 2 + [1] * 4 + [2] * 3)
    p = Partitioner(folds)
    keys, idx, mask = p.padded_batches()
    assert idx.shape == (3, 4) and mask.shape == (3, 4)
    assert mask.sum() == 9
    i0 = keys.index(0)
    np.testing.assert_array_equal(mask[i0], [1, 1, 0, 0])
    with pytest.raises(ValueError, match="pad_to"):
        p.padded_batches(pad_to=3)


def test_loocv_scale():
    n = 100_000
    p = Partitioner(np.arange(n) % 1000)
    assert p.num_folds == 1000
    assert all(v.size == 100 for v in p.folds_dict.values())


def test_nan_labels_each_their_own_fold():
    """Reference dict semantics: distinct NaN label objects hash equal but
    compare unequal, so every NaN row is its own fold — np.unique would
    collapse them into one (round-3 review finding)."""
    folds = np.array([0.0, np.nan, 1.0, np.nan])
    p = Partitioner(folds)
    assert p.num_folds == 4
    sizes = sorted(v.size for v in p.folds_dict.values())
    assert sizes == [1, 1, 1, 1]


def test_mixed_object_labels():
    """Mutually-uncomparable object labels group fine via the dict loop
    (np.unique's sort would raise TypeError)."""
    folds = np.array(["a", 1, "a", 1], dtype=object)
    p = Partitioner(folds)
    assert p.num_folds == 2
    np.testing.assert_array_equal(p.get_validation_indices("a"), [0, 2])
    np.testing.assert_array_equal(p.get_validation_indices(1), [1, 3])


def test_validate_ddof_default_matches_engine():
    import inspect

    from cvmatrix_tpu import CVConfig

    sig = inspect.signature(Partitioner.validate)
    assert sig.parameters["ddof"].default == CVConfig().ddof
