"""Debug intermediates: the TPU-native replacement for the reference's
save_f32_tensor / compare_to_saved_tensor_with_name dump-and-diff workflow
(main.cpp:384-450, 4917-5001).

Enable with TORTOISE_DUMP_DIR=/path (or construct a DumpRegistry): model
code calls ``dump(name, array)``; arrays land as .npy files. A later run
(or the reference's own ./logs dumps converted to .npy) can be diffed with
``compare_dumps``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


class DumpRegistry:
    def __init__(self, directory: Optional[str] = None):
        self._directory = directory
        self.counter = 0
        if directory:
            os.makedirs(directory, exist_ok=True)

    @property
    def directory(self) -> Optional[str]:
        # the env var is re-read per call so enabling TORTOISE_DUMP_DIR
        # programmatically AFTER import still takes effect (the default
        # registry is constructed at module import)
        return self._directory or os.environ.get("TORTOISE_DUMP_DIR")

    @property
    def enabled(self) -> bool:
        return bool(self.directory)

    def dump(self, name: str, array) -> None:
        d = self.directory
        if not d:
            return
        os.makedirs(d, exist_ok=True)
        arr = np.asarray(array)
        path = os.path.join(d, f"{self.counter:04d}_{name}.npy")
        np.save(path, arr)
        self.counter += 1


_default = DumpRegistry()


def dump(name: str, array) -> None:
    _default.dump(name, array)


def compare_dumps(dir_a: str, dir_b: str, atol: float = 1e-2,
                  ) -> List[Tuple[str, float]]:
    """Diff two dump directories by tensor name (ignoring the NNNN_
    counter prefix when present). Returns [(name, max_abs_diff)] for
    mismatches beyond atol; a NaN anywhere in either tensor counts as a
    mismatch (NaN comparisons are False, so a naive `diff > atol` would
    report the poisoned tensor — the exact thing this tool exists to
    catch — as a pass)."""

    def index(d: str) -> Dict[str, str]:
        # key on the stripped name PLUS a per-name occurrence ordinal:
        # repeated dump names (per-layer dumps like 0000_attn_out,
        # 0012_attn_out) must each be compared — a plain name->path map
        # kept only the LAST occurrence, silently passing divergences in
        # every earlier layer
        out: Dict[str, str] = {}
        seen: Dict[str, int] = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".npy"):
                stem = f[: -len(".npy")]
                head, _, tail = stem.partition("_")
                # strip only a numeric counter prefix; keep bare names
                name = tail if tail and head.isdigit() else stem
                i = seen.get(name, 0)
                seen[name] = i + 1
                out[name if i == 0 else f"{name}@{i}"] = os.path.join(d, f)
        return out

    a, b = index(dir_a), index(dir_b)
    bad = []
    # a tensor dumped by only one run IS a divergence (a crashed or
    # renamed stage must not read as a clean diff)
    for name in sorted(set(a) ^ set(b)):
        bad.append((name + " (only one side)", float("inf")))
    for name in sorted(set(a) & set(b)):
        x, y = np.load(a[name]), np.load(b[name])
        if x.shape != y.shape:
            bad.append((name, float("inf")))
            continue
        if x.size == 0:
            continue
        diff = np.abs(x.astype(np.float64) - y.astype(np.float64))
        if np.isnan(diff).any():
            bad.append((name, float("nan")))
        elif float(np.max(diff)) > atol:
            bad.append((name, float(np.max(diff))))
    return bad
