"""Disk cache for production-plane (quantized) host weight trees.

Warm serving restarts pay three costs before the first utterance: read
the checkpoint, quantize the matmul weights, and push bytes to the
device. The reference pays only the first (it mmaps GGML and computes
in place, main.cpp:649-720); a TPU process additionally uploads through
the host->device link — ~20 MB/s over this environment's remote tunnel,
PCIe-fast on a directly-attached TPU. This module removes the first two
for restarts: after one process quantizes (ops.basic.quantize_cols_host),
the int8 pairs + f32 residue are saved as one .npy per leaf, and later
processes memory-map them — no f32 read (2.8x fewer bytes than the f32
tree), no re-quantization, and the OS streams pages straight from the
page cache into the device upload.

Layout: one directory per tree; each leaf at tree path a/b/c lives in
a/b/c.npy; list/tuple nodes use '#<i>' path segments (the save_npz
scheme, io/checkpoint.py:135-149). Loaded trees return pairs as tuples
so `isinstance(w, tuple)` plane checks keep working. A MANIFEST.json
written last makes partially-written caches invisible; writers build in
a tmp sibling and os.rename into place.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import numpy as np

_MANIFEST = "MANIFEST.json"


def _flatten(prefix, node, out):
    if isinstance(node, dict):
        for k, v in node.items():
            _flatten(f"{prefix}{k}/", v, out)
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            _flatten(f"{prefix}#{i}/", v, out)
    else:
        out[prefix[:-1]] = np.asarray(node)


def save_plane(tree: dict, path: str) -> None:
    """Write `tree` (host numpy pytree of dict/list/tuple/ndarray) under
    directory `path`, atomically (tmp dir + rename)."""
    flat: dict = {}
    _flatten("", tree, flat)
    tmp = f"{path}.{os.getpid()}.tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    for key, arr in flat.items():
        fp = os.path.join(tmp, key + ".npy")
        os.makedirs(os.path.dirname(fp) or tmp, exist_ok=True)
        np.save(fp, arr)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, _MANIFEST), "w") as f:
        json.dump({"keys": sorted(flat)}, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def plane_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, _MANIFEST))


def load_plane(path: str, mmap: bool = True) -> Optional[dict]:
    """Rebuild the tree saved by save_plane, or None if `path` has no
    complete cache. mmap=True memory-maps every leaf (read-only): pages
    stream from disk on first touch — typically during device upload —
    instead of an up-front read pass."""
    mf = os.path.join(path, _MANIFEST)
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        keys = json.load(f)["keys"]
    out: dict = {}
    mode = "r" if mmap else None
    for key in keys:
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.load(os.path.join(path, key + ".npy"),
                                  mmap_mode=mode)

    def fold(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return tuple(fold(node[f"#{i}"]) for i in range(len(node)))
        return {k: fold(v) for k, v in node.items()}

    return fold(out)
