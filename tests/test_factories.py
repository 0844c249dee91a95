"""Factory function tests (reference: neuronika-variable/src/lib.rs:288-398)."""

import numpy as np
import pytest

import neuronika_tpu as nk
from tests.conftest import assert_close


def test_zeros_ones_full():
    assert_close(nk.zeros((2, 3)).data(), np.zeros((2, 3)))
    assert_close(nk.ones(4).data(), np.ones(4))
    assert_close(nk.full((2, 2), 7.0).data(), np.full((2, 2), 7.0))


def test_rand_range_unit():
    r = np.asarray(nk.rand((100,)).data())
    assert (r >= 0).all() and (r < 1).all()
    assert r.std() > 0.1


def test_eye():
    assert_close(nk.eye(3).data(), np.eye(3))


def test_linspace():
    assert_close(nk.linspace(0.0, 1.0, 5).data(), np.linspace(0, 1, 5))


def test_logspace():
    assert_close(
        nk.logspace(10.0, 0.0, 3.0, 4).data(),
        np.logspace(0.0, 3.0, 4, base=10.0),
        tol=1e-4,
    )


def test_geomspace():
    assert_close(nk.geomspace(1.0, 1000.0, 4).data(), np.geomspace(1, 1000, 4), tol=1e-4)
    assert nk.geomspace(-1.0, 1.0, 4) is None
    assert nk.geomspace(0.0, 1.0, 4) is None


def test_range():
    assert_close(nk.range(0.0, 5.0, 1.5).data(), np.arange(0.0, 5.0, 1.5))


def test_from_ndarray_dtype():
    v = nk.from_ndarray(np.arange(4, dtype=np.int64))
    assert v.dtype == np.float32
