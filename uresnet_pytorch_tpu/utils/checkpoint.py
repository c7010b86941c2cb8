"""Checkpoint save/restore.

Mirrors the reference contract (SURVEY.md §3.5): a single
``{weight_prefix}-{iteration}.ckpt`` file holding
{global_step, state_dict, optimizer} — here {step, params, batch_stats,
opt_state} serialized with flax msgpack. Writes are atomic
(temp + rename, SURVEY.md §5.3); ``latest_checkpoint`` supports --resume.

PyTorch-reference weight import lives in utils/torch_import.py (M5).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

from flax import serialization


def save_checkpoint(path: str, tree: Any) -> str:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    data = serialization.to_bytes(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def checkpoint_path(weight_prefix: str, iteration: int) -> str:
    return f"{weight_prefix}-{iteration}.ckpt"


def latest_checkpoint(weight_prefix: str) -> Optional[str]:
    """Highest-iteration ``{prefix}-{i}.ckpt`` on disk, or None."""
    best, best_it = None, -1
    for p in glob.glob(f"{weight_prefix}-*.ckpt"):
        m = re.search(r"-(\d+)\.ckpt$", p)
        if m and int(m.group(1)) > best_it:
            best, best_it = p, int(m.group(1))
    return best
