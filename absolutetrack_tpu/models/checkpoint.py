"""Parameter checkpoint save/load.

The reference only ever loads a torch state dict (model_loader.py:84-88).
This framework adds native round-trippable checkpoints:
  * ``save_params`` / ``load_params``: flax msgpack serialization of the
    param tree (single file, host-agnostic);
  * ``load_any``: dispatch between native checkpoints and torch state
    dicts (via weights.convert_torch_state_dict) on magic/extension.

Tracker/temporal state is NOT checkpointed -- it is an explicit pytree the
caller owns (resume = re-run with a fresh state; per-sequence eval results
double as resume points exactly like the reference's skip-if-exists logic,
run_eval_known_skeleton.py:54-56, which our eval apps reproduce).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig


def save_params(path: str, params: Dict) -> None:
    from flax import serialization

    data = serialization.to_bytes(jax.tree.map(np.asarray, params))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic publish


def load_params(path: str, cfg: ModelConfig = ModelConfig()) -> Dict:
    from flax import serialization

    from .umetrack import init_umetrack_params

    template = init_umetrack_params(jax.random.PRNGKey(0), cfg)
    with open(path, "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return jax.tree.map(jnp.asarray, params)


def load_any(path: str, cfg: ModelConfig = ModelConfig()) -> Dict:
    """Native flax-msgpack checkpoint or a torch state dict.

    Dispatch: torch extensions (.torch/.pt/.pth) go to the converter;
    otherwise the file's magic bytes are sniffed -- torch zip archives
    start with ``PK\\x03\\x04`` and legacy torch pickles with the pickle
    protocol-2 marker ``\\x80`` -- before falling back to native msgpack.
    """
    from .weights import load_torch_checkpoint

    def _torch(p):
        return jax.tree.map(jnp.asarray, load_torch_checkpoint(p, cfg))

    if path.endswith((".torch", ".pt", ".pth")):
        return _torch(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    # legacy pickle = \x80 + protocol byte 2..5; a single \x80 also matches
    # msgpack's empty-fixmap marker, so check both bytes (advisor finding)
    legacy_pickle = (
        len(magic) >= 2 and magic[0] == 0x80 and magic[1] in (2, 3, 4, 5)
    )
    if magic.startswith(b"PK\x03\x04") or legacy_pickle:
        return _torch(path)
    try:
        return load_params(path, cfg)
    except Exception as e:
        raise ValueError(
            f"{path}: failed to load as a native flax-msgpack checkpoint "
            f"(magic bytes {magic!r} are not a torch zip/pickle either). "
            "If the file IS a native checkpoint, the configured "
            "architecture likely does not match the one it was saved from "
            f"(cfg={cfg}); otherwise the supported formats are native "
            ".msgpack from save_params or a torch state dict "
            "(.torch/.pt/.pth). Original error follows."
        ) from e


def save_train_state(path: str, state) -> None:
    """Checkpoint a full TrainState (params + optimizer moments + step) for
    resumable training -- elastic-recovery support the reference lacks
    (SURVEY section 5.3: its only resume is skip-if-output-exists)."""
    from flax import serialization

    data = serialization.to_bytes(jax.tree.map(np.asarray, state))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_train_state(path: str, template):
    """Restore a TrainState saved by save_train_state; ``template`` is a
    freshly-initialized TrainState with matching structure."""
    from flax import serialization

    with open(path, "rb") as f:
        state = serialization.from_bytes(template, f.read())
    return jax.tree.map(jnp.asarray, state)
