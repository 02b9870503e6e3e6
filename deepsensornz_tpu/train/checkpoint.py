"""Checkpointing: params + optimizer state + run metadata.

Artifact-layout parity with the reference run directory (weights +
metadata pickle + data_processor + task_loader, ``train.py:409-417,498-510``;
reload at ``validate_ERA.py:19-44``), with TPU-era upgrades the reference
lacks (SURVEY.md §5.4): optimizer state is checkpointed (mid-run resume)
and everything is written atomically.

Format: flax msgpack for array pytrees, JSON for metadata — no pickle
needed for the tensors, so checkpoints are portable across hosts.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional

import flax.serialization as fser
import jax
import numpy as np

PARAMS_FILE = "params.msgpack"
OPT_FILE = "opt_state.msgpack"
META_FILE = "metadata.json"


def _atomic_write(path: str, data: bytes) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d)
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class _JsonEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, np.datetime64):
            return str(o)
        return super().default(o)


def save_checkpoint(
    ckpt_dir: str,
    params,
    opt_state=None,
    step: int = 0,
    metadata: Optional[dict[str, Any]] = None,
) -> None:
    """Write params (+opt state) and metadata atomically into ``ckpt_dir``."""
    params = jax.device_get(params)
    _atomic_write(os.path.join(ckpt_dir, PARAMS_FILE), fser.to_bytes(params))
    if opt_state is not None:
        _atomic_write(os.path.join(ckpt_dir, OPT_FILE), fser.to_bytes(jax.device_get(opt_state)))
    meta = {"step": int(step), **(metadata or {})}
    _atomic_write(
        os.path.join(ckpt_dir, META_FILE),
        json.dumps(meta, indent=2, cls=_JsonEncoder).encode(),
    )


def update_metadata(ckpt_dir: str, **updates) -> dict:
    """Merge ``updates`` into an existing checkpoint's metadata atomically
    (weights untouched). Used for post-training artifact annotations, e.g.
    the ``std_scale`` recalibration factor."""
    meta_path = os.path.join(ckpt_dir, META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta.update(updates)
    _atomic_write(
        meta_path, json.dumps(meta, indent=2, cls=_JsonEncoder).encode()
    )
    return meta


def load_checkpoint(
    ckpt_dir: str,
    params_template,
    opt_state_template=None,
) -> dict[str, Any]:
    """Load a checkpoint; templates supply the pytree structure
    (``load_state_dict`` parity, ``train.py:249-251``)."""
    with open(os.path.join(ckpt_dir, PARAMS_FILE), "rb") as f:
        params = fser.from_bytes(params_template, f.read())
    out: dict[str, Any] = {"params": params}
    opt_path = os.path.join(ckpt_dir, OPT_FILE)
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            out["opt_state"] = fser.from_bytes(opt_state_template, f.read())
    meta_path = os.path.join(ckpt_dir, META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out["metadata"] = json.load(f)
    return out
