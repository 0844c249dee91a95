"""Coverage for utilities: profiler, config toggles, example smoke."""

import numpy as np
import pytest

import neuronika_tpu as nk
from neuronika_tpu.utils.profiler import StepTimer
from tests.conftest import assert_close


def test_step_timer():
    import jax.numpy as jnp

    t = StepTimer()
    for i in range(3):
        with t:
            t.observe(jnp.ones((8, 8)) * i)
    s = t.summary(skip_first=1)
    assert s["steps"] == 2
    assert s["mean_ms"] > 0
    assert s["min_ms"] <= s["p50_ms"] <= s["max_ms"]


def test_enable_pallas_clears_caches():
    import neuronika_tpu._engine.executor as ex
    from neuronika_tpu.config import config, enable_pallas

    x = nk.ones((4, 4))
    y = x + x
    y.forward()
    assert ex.cache_stats()[0] >= 1
    enable_pallas(True, interpret=True)
    try:
        assert ex.cache_stats() == (0, 0)
        assert config.use_pallas and config.pallas_interpret
    finally:
        enable_pallas(False)
    assert not config.use_pallas


def test_quickstart_example_runs(capsys):
    import examples.quickstart as q

    q.main()
    out = capsys.readouterr().out
    assert out.count("Loss for epoch") == 5


def test_repr_formats():
    v = nk.ones((2, 2))
    assert "Var" in repr(v)
    d = v.requires_grad()
    assert "VarDiff" in repr(d)
    assert repr(nk.default_device()).startswith("Device(")
