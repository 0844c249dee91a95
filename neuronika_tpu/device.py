"""Device placement — the TPU-native equivalent of the reference's CUDA
tier (`cuda::{Device, CuArray, CuVar}`, neuronika-variable/src/cuda/*).

The reference's experimental GPU story is a separate variable type whose
buffers live on one device. Under JAX there is exactly one array type and
placement is a property, so the parity surface collapses to: enumerate
devices, pin a variable's buffer to one, and ask where a variable lives.
All compute (the jitted tape programs) follows the data's placement.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax

from .variable import Var

__all__ = ["Device", "devices", "default_device", "to_device", "device_of"]


class Device:
    """Handle to one accelerator (reference cuda/device.rs:11-75 bundles a
    CUDA context; here it wraps a jax.Device)."""

    def __init__(self, index: int = 0, platform: Optional[str] = None) -> None:
        ds = jax.devices(platform) if platform else jax.devices()
        if index >= len(ds):
            raise ValueError(f"device index {index} out of range ({len(ds)} present)")
        self.jax_device = ds[index]

    @property
    def platform(self) -> str:
        return self.jax_device.platform

    @property
    def index(self) -> int:
        return self.jax_device.id

    def __repr__(self) -> str:
        return f"Device({self.jax_device})"


def devices(platform: Optional[str] = None) -> List[Device]:
    out = []
    for i, _ in enumerate(jax.devices(platform) if platform else jax.devices()):
        d = Device.__new__(Device)
        d.jax_device = (jax.devices(platform) if platform else jax.devices())[i]
        out.append(d)
    return out


def default_device() -> Device:
    return Device(0)


def to_device(variable: Var, device: Union[Device, "jax.Device"]) -> Var:
    """Pin a leaf variable's buffer to a device (in place; returns it).
    The reference instead constructs a `CuVar` copy (cuda/cuvar.rs:48-78)."""
    dev = device.jax_device if isinstance(device, Device) else device
    variable.node.value = jax.device_put(variable.node.get_value(), dev)
    variable.node.computed = True
    return variable


def device_of(variable: Var) -> Device:
    arr = variable.node.get_value()
    d = Device.__new__(Device)
    d.jax_device = list(arr.devices())[0]
    return d
