"""Serialization / checkpointing.

Parity with the reference's `serialize` feature: Var/VarDiff serialize their
**data only** (neuronika-variable/src/serde.rs:10-58 — gradients and graph
are not persisted; deserialization rebuilds a leaf) and nn layers serialize
their parameter set (neuronika-nn derives, lib.rs:405,451,545,629). Two
formats:

* JSON — matches the reference's serde_json usage (quickstart.rs:47-179
  loads a model from a JSON string). Layout per variable:
  ``{"v": 1, "dim": [...], "data": [...]}`` like ndarray's serde layout.
* NPZ — the practical binary path for real checkpoints (save_npz/load_npz),
  plus `save_pytree`/`load_pytree` for functional-model params.

Matching the reference, model serde never includes optimizer state
(SURVEY.md §5 checkpoint row); `save_optimizer`/`load_optimizer` exist as an
explicit opt-in extension for real training resume.
"""

from __future__ import annotations

import json
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..variable import Var, VarDiff

__all__ = [
    "var_to_dict", "var_from_dict", "dumps", "loads",
    "save_layer", "load_layer", "state_dict", "load_state_dict",
    "save_npz", "load_npz", "save_pytree", "load_pytree",
    "save_optimizer", "load_optimizer",
]


# --------------------------------------------------------------------------
# Var-level (reference serde.rs: data only, leaf rebuild)


def var_to_dict(v: Var) -> Dict:
    arr = np.asarray(v.data())
    return {"v": 1, "dim": list(arr.shape), "data": arr.reshape(-1).tolist()}


def var_from_dict(d: Dict, requires_grad: bool = False) -> Var:
    from .. import from_ndarray

    arr = np.asarray(d["data"], dtype=np.float32).reshape(d["dim"])
    v = from_ndarray(arr)
    return v.requires_grad() if requires_grad else v


def dumps(v: Var) -> str:
    return json.dumps(var_to_dict(v))


def loads(s: str, requires_grad: bool = False) -> Var:
    return var_from_dict(json.loads(s), requires_grad)


# --------------------------------------------------------------------------
# layer/model-level


def _param_fields(layer) -> List[str]:
    """Names of the layer's VarDiff attributes, in declaration order."""
    return [k for k, v in vars(layer).items() if isinstance(v, Var)]


def save_layer(layer) -> Dict:
    """Layer -> JSON-able dict of its parameters (reference derive layout)."""
    return {name: var_to_dict(getattr(layer, name)) for name in _param_fields(layer)}


def load_layer(layer, d: Dict) -> None:
    """Write serialized parameters back into an existing layer's buffers
    (shape-checked)."""
    for name, spec in d.items():
        param = getattr(layer, name)
        arr = np.asarray(spec["data"], dtype=np.float32).reshape(spec["dim"])
        param.assign(arr)


def state_dict(model: Dict) -> Dict:
    """{name: layer} -> nested JSON-able dict."""
    return {name: save_layer(layer) for name, layer in model.items()}


def load_state_dict(model: Dict, state: Dict) -> None:
    for name, layer_state in state.items():
        load_layer(model[name], layer_state)


# --------------------------------------------------------------------------
# binary checkpoints


def _npz_path(path: str) -> str:
    # np.savez appends '.npz' to a suffixless path; normalise on both ends
    # so save_npz('ckpt') / load_npz('ckpt') round-trips.
    return path if path.endswith(".npz") else path + ".npz"


def save_npz(path: str, variables: Dict[str, Var]) -> None:
    np.savez(
        _npz_path(path),
        **{k: np.asarray(v.data()) for k, v in variables.items()},
    )


def load_npz(path: str, variables: Dict[str, Var]) -> None:
    with np.load(_npz_path(path)) as data:
        for k, v in variables.items():
            v.assign(data[k])


def save_optimizer(path: str, optimizer) -> None:
    """Checkpoint optimizer slot state + step counter (extension — the
    reference cannot persist optimizer state, SURVEY.md §5)."""
    flat = {"__step__": np.asarray(optimizer._step_count)}
    for i, state in enumerate(optimizer._state):
        for k, v in state.items():
            flat[f"{i}.{k}"] = np.asarray(v)
    np.savez(_npz_path(path), **flat)


def load_optimizer(path: str, optimizer) -> None:
    """Restore state saved by `save_optimizer` into a compatible optimizer
    (same algorithm, same registration order)."""
    with np.load(_npz_path(path)) as data:
        optimizer._step_count = int(data["__step__"])
        new_state = []
        for i, state in enumerate(optimizer._state):
            new_state.append(
                {k: jnp.asarray(data[f"{i}.{k}"]) for k in state.keys()}
            )
    optimizer._state = new_state


def save_pytree(path: str, tree) -> None:
    """Functional-model params: flatten and store leaves + treedef repr."""
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_pytree(path: str, like):
    """Load leaves saved by `save_pytree` into the structure of `like`."""
    leaves, treedef = jax.tree.flatten(like)
    with np.load(path) as data:
        new_leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)
