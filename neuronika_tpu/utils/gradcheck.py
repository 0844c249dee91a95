"""Finite-difference gradient checking.

The reference has no gradcheck (its conv goldens play that role —
SURVEY.md §4); this adds the real thing for the define-by-run API, used by
the configs[3] sweep (conv × optimizers) and available to users."""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

__all__ = ["gradcheck"]


def gradcheck(
    build: Callable[..., "object"],
    inputs: Sequence[np.ndarray],
    eps: float = 1e-3,
    atol: float = 1e-2,
    rtol: float = 1e-2,
) -> bool:
    """Check the tape's backward against central finite differences.

    `build(*vardiffs)` must return a scalar-output variable built from the
    given differentiable leaves. Raises AssertionError on mismatch.
    """
    import neuronika_tpu as nk

    leaves = [nk.from_ndarray(a).requires_grad() for a in inputs]
    root = build(*leaves)
    root.forward()
    root.backward(1.0)
    analytic = [np.asarray(l.grad()).copy() for l in leaves]

    def eval_at(arrays):
        ls = [nk.from_ndarray(a) for a in arrays]
        r = build(*ls)
        r.forward()
        return float(np.asarray(r.data()))

    for idx, base in enumerate(inputs):
        num = np.zeros_like(base, dtype=np.float64)
        for j in range(base.size):
            # Always copy (np.ascontiguousarray aliases when already
            # contiguous) and index via unravel_index: reshape(-1) on a
            # non-contiguous view returns a copy and would make the bump a
            # silent no-op.
            pos = np.unravel_index(j, base.shape)
            bumped = [np.array(a, order="C", copy=True) for a in inputs]
            bumped[idx][pos] = base[pos] + eps
            up = eval_at(bumped)
            bumped[idx][pos] = base[pos] - eps
            down = eval_at(bumped)
            num[pos] = (up - down) / (2 * eps)
        np.testing.assert_allclose(
            analytic[idx], num, rtol=rtol, atol=atol,
            err_msg=f"gradcheck failed for input {idx}",
        )
    return True
