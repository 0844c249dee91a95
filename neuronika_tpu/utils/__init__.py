"""Serialization, checkpointing, misc utilities."""
from . import aot, hf, hub, metrics, profiler, serde  # noqa: F401
from .hf import from_huggingface  # noqa: F401
from . import gradcheck as gradcheck_mod  # noqa: F401
from .aot import export_fn, load_exported, save_exported  # noqa: F401
from .gradcheck import gradcheck  # noqa: F401
from .metrics import MetricsLogger  # noqa: F401
from .serde import (  # noqa: F401
    dumps, load_layer, load_npz, load_optimizer, load_pytree,
    load_state_dict, loads, save_layer, save_npz, save_optimizer,
    save_pytree, state_dict, var_from_dict, var_to_dict,
)

__all__ = [
    "profiler", "gradcheck", "hf", "from_huggingface",
    "aot", "export_fn", "load_exported", "save_exported",
    "metrics", "MetricsLogger",
    "serde", "dumps", "loads", "var_to_dict", "var_from_dict",
    "save_layer", "load_layer", "state_dict", "load_state_dict",
    "save_npz", "load_npz", "save_pytree", "load_pytree",
    "save_optimizer", "load_optimizer",
]
