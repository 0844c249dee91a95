"""Device placement module (parity surface of the reference's cuda tier)."""

import numpy as np
import pytest

import neuronika_tpu as nk
from tests.conftest import assert_close


def test_devices_enumeration():
    ds = nk.devices()
    assert len(ds) >= 1
    assert ds[0].platform == "cpu"  # test mesh is CPU


def test_to_device_roundtrip():
    v = nk.from_ndarray(np.arange(4.0))
    d = nk.default_device()
    nk.to_device(v, d)
    assert nk.device_of(v).index == d.index
    assert_close(v.data(), np.arange(4.0))


def test_device_index_validation():
    with pytest.raises(ValueError):
        nk.Device(10_000)


def test_compute_follows_placement():
    v = nk.to_device(nk.ones((2, 2)), nk.default_device()).requires_grad()
    y = (v * 2.0).sum()
    y.forward()
    y.backward(1.0)
    assert_close(v.grad(), np.full((2, 2), 2.0))
