"""Model bundles: one directory holding params + config + tokenizer.

`save_model(dir, params, cfg, tokenizer=None)` /
`load_model(dir) -> (params, cfg, tokenizer | None)` — the
"save_pretrained" workflow: everything needed to resume or serve a
model travels together. Params are stored as an npz keyed by their
tree paths (self-describing — no `like` structure needed to load);
the config dataclass round-trips through JSON with the dtype stored
by name.

Extension beyond the reference (whose serde is single-variable JSON —
neuronika-variable's serde feature); built on utils/serde.py's npz
conventions.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CONFIG_CLASSES: Dict[str, Any] = {}


def _config_registry():
    if not _CONFIG_CLASSES:
        from ..models import t5, transformer

        _CONFIG_CLASSES["GPTConfig"] = transformer.GPTConfig
        _CONFIG_CLASSES["Seq2SeqConfig"] = t5.Seq2SeqConfig
    return _CONFIG_CLASSES


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_model(directory: str, params, cfg, tokenizer=None) -> None:
    """Write `<dir>/params.npz`, `<dir>/config.json`, and (if given)
    `<dir>/tokenizer.json`."""
    os.makedirs(directory, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(os.path.join(directory, "params.npz"),
             **{_path_key(p): np.asarray(l) for p, l in flat})
    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(d["dtype"]).name
    d["__config_class__"] = type(cfg).__name__
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(d, f, indent=1)
    if tokenizer is not None:
        tokenizer.save(os.path.join(directory, "tokenizer.json"))


def load_model(directory: str) -> Tuple[Dict, Any, Optional[Any]]:
    """Rebuild (params, cfg, tokenizer). The params tree is
    reconstructed from the stored key paths (nested dicts)."""
    with open(os.path.join(directory, "config.json")) as f:
        d = json.load(f)
    cls = _config_registry()[d.pop("__config_class__")]
    d["dtype"] = getattr(jnp, d["dtype"])
    cfg = cls(**d)

    params: Dict = {}
    npz = os.path.join(directory, "params.npz")
    with np.load(npz) as data:
        for key in data.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(data[key])

    tok = None
    tok_path = os.path.join(directory, "tokenizer.json")
    if os.path.exists(tok_path):
        from ..data.tokenizer import BpeTokenizer

        tok = BpeTokenizer.load(tok_path)
    return params, cfg, tok
