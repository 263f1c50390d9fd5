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


def _flatten(prefix, node, out, lists):
    if isinstance(node, dict):
        for k, v in node.items():
            _flatten(f"{prefix}{k}/", v, out, lists)
    elif isinstance(node, (list, tuple)):
        if isinstance(node, list):
            # remember which sequence nodes were LISTS: quantized pairs
            # round-trip as tuples (isinstance(w, tuple) plane checks)
            # but structural lists (e.g. the vocoder's stages) must come
            # back as lists or jax.tree.map against list-typed spec
            # trees (parallel/sharding.py) raises a structure mismatch
            lists.append(prefix[:-1] or "")
        for i, v in enumerate(node):
            _flatten(f"{prefix}#{i}/", v, out, lists)
    else:
        out[prefix[:-1]] = np.asarray(node)


def save_plane(tree: dict, path: str) -> None:
    """Write `tree` (host numpy pytree of dict/list/tuple/ndarray) under
    directory `path`, atomically (tmp dir + rename). `path` must be
    content-keyed (a pure function of what produced the tree): when a
    complete cache already exists it is kept as-is and this write is
    discarded — replacing it would yank leaves out from under a
    concurrent reader that already validated the manifest. Concurrent
    writers race benignly: one publish wins, the losers discard."""
    flat: dict = {}
    lists: list = []
    _flatten("", tree, flat, lists)
    tmp = f"{path}.{os.getpid()}.tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    for key, arr in flat.items():
        fp = os.path.join(tmp, key + ".npy")
        os.makedirs(os.path.dirname(fp) or tmp, exist_ok=True)
        np.save(fp, arr)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, _MANIFEST), "w") as f:
        json.dump({"keys": sorted(flat), "lists": sorted(lists)}, f)
    if plane_exists(path):
        # another writer already published a complete cache of the same
        # content (the plane is a pure function of the weights); NEVER
        # rmtree it to install ours — a reader that just validated its
        # manifest would hit FileNotFoundError on the leaves mid-load
        shutil.rmtree(tmp, ignore_errors=True)
        return
    try:
        if os.path.exists(path):
            # a manifest-LESS directory is a stale partial (no reader
            # can be consuming it: load_plane requires the manifest) —
            # clear it or os.replace fails ENOTEMPTY on every start
            shutil.rmtree(path)
        os.replace(tmp, path)
    except OSError:
        # two cold-starting processes raced the publish: the other
        # writer's replace landed first. Their cache is equivalent.
        if not plane_exists(path):
            raise
        shutil.rmtree(tmp, ignore_errors=True)


def plane_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, _MANIFEST))


def load_plane(path: str, mmap: bool = True) -> Optional[dict]:
    """Rebuild the tree saved by save_plane, or None if `path` has no
    complete cache. mmap=True memory-maps every leaf (read-only): pages
    stream from disk on first touch — typically during device upload —
    instead of an up-front read pass."""
    mf = os.path.join(path, _MANIFEST)
    try:
        with open(mf) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        return None
    keys = manifest["keys"]
    list_paths = set(manifest.get("lists", ()))
    out: dict = {}
    mode = "r" if mmap else None
    try:
        for key in keys:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.load(os.path.join(path, key + ".npy"),
                                      mmap_mode=mode)
    except OSError:
        # the cache vanished under us (manual cleanup, external tooling):
        # a cold start is the contract, not a crash
        return None

    def fold(node, prefix):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            seq = [fold(node[f"#{i}"], f"{prefix}#{i}/")
                   for i in range(len(node))]
            return seq if prefix[:-1] in list_paths else tuple(seq)
        return {k: fold(v, f"{prefix}{k}/") for k, v in node.items()}

    return fold(out, "")
