"""Model save/load in a portable directory format (HF-hub-mixin parity).

Capability parity with reference gpt_hf.py / vq_model_hf.py (PyTorchModelHubMixin
wrappers for weight publishing): `save_pretrained` writes config.json + a flat
.npz of params; `from_pretrained` restores both. Works offline (this
environment has no hub access); directories are hub-uploadable as-is.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def save_pretrained(directory: str, params: Any, config: Any):
    """Write config.json + params.npz (ref gpt_hf.py save surface)."""
    os.makedirs(directory, exist_ok=True)
    cfg_dict = dataclasses.asdict(config) if dataclasses.is_dataclass(config) \
        else dict(config)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2, default=str)
    np.savez(os.path.join(directory, "params.npz"), **_flatten(params))


def from_pretrained(directory: str, config_cls) -> Tuple[Any, Any]:
    """Returns (params, config)."""
    with open(os.path.join(directory, "config.json")) as f:
        cfg_dict = json.load(f)
    import inspect
    valid = set(inspect.signature(config_cls).parameters)
    cfg_dict = {k: (tuple(v) if isinstance(v, list) else v)
                for k, v in cfg_dict.items() if k in valid}
    config = config_cls(**cfg_dict)
    data = np.load(os.path.join(directory, "params.npz"))
    params = _unflatten({k: data[k] for k in data.files})
    return params, config
