"""Parameter initialisation (reference: neuronika-nn/src/init.rs).

All functions write through the variable's shared buffer (the reference goes
through `data_mut()`, init.rs:74-244). They operate on `Var` or `VarDiff`.

Divergence from the reference, by design: `calculate_fan_in_fan_out` uses the
*product* of the receptive-field dims. The reference sums them
(init.rs:57 uses `.sum()`), which is a known bug in that snapshot
(SURVEY.md §2.3) — fan-in/fan-out are defined with the receptive field
*size*, i.e. the product.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import config
from ..variable import Var


def calculate_gain(non_linearity: str) -> float:
    """Recommended gain for an activation (init.rs:25-33)."""
    if non_linearity in ("linear", "sigmoid", "conv"):
        return 1.0
    if non_linearity == "tanh":
        return 5.0 / 3.0
    if non_linearity == "relu":
        return math.sqrt(2.0)
    if non_linearity == "leaky_relu":
        return math.sqrt(2.0 / (1.0 + 0.01**2))
    raise ValueError(f"unsupported non-linearity: {non_linearity}")


def calculate_fan_in_fan_out(param: Var) -> tuple:
    """(fan_in, fan_out) for a ≥2-d parameter (init.rs:45-65; see module
    docstring for the receptive-field product fix)."""
    shape = param.shape
    if len(shape) < 2:
        raise ValueError(
            "fan in and fan out can not be computed for tensor with fewer than 2 dimensions"
        )
    receptive = 1
    for d in shape[2:]:
        receptive *= d
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return float(fan_in), float(fan_out)


def constant(param: Var, value: float) -> None:
    param.assign(jnp.full(param.shape, value, param.dtype))


def zeros(param: Var) -> None:
    constant(param, 0.0)


def ones(param: Var) -> None:
    constant(param, 1.0)


def eye(param: Var) -> None:
    if len(param.shape) != 2:
        raise ValueError("eye init requires a 2-dimensional parameter")
    param.assign(jnp.eye(*param.shape, dtype=param.dtype))


def dirac(param: Var, groups: int = 1) -> None:
    """Dirac delta init for {3,4,5}-d conv kernels, preserving identity of
    the inputs (init.rs:131-170)."""
    shape = param.shape
    if len(shape) not in (3, 4, 5):
        raise ValueError("dirac init requires a 3, 4 or 5-dimensional parameter")
    out_ch, in_ch = shape[0], shape[1]
    if out_ch % groups != 0:
        raise ValueError("output channels must be divisible by groups")
    out_per_group = out_ch // groups
    min_dim = min(out_per_group, in_ch)
    arr = jnp.zeros(shape, param.dtype)
    centers = tuple(d // 2 for d in shape[2:])
    for g in range(groups):
        for d in range(min_dim):
            idx = (g * out_per_group + d, d) + centers
            arr = arr.at[idx].set(1.0)
    param.assign(arr)


def uniform(param: Var, low: float, high: float) -> None:
    param.assign(
        jax.random.uniform(
            config.next_key(), param.shape, param.dtype, minval=low, maxval=high
        )
    )


def normal(param: Var, mean: float, std: float) -> None:
    param.assign(
        mean + std * jax.random.normal(config.next_key(), param.shape, param.dtype)
    )


def xavier_uniform(param: Var, gain: float = 1.0) -> None:
    fan_in, fan_out = calculate_fan_in_fan_out(param)
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    uniform(param, -a, a)


def xavier_normal(param: Var, gain: float = 1.0) -> None:
    fan_in, fan_out = calculate_fan_in_fan_out(param)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    normal(param, 0.0, std)
