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
        self.directory = directory or os.environ.get("TORTOISE_DUMP_DIR")
        self.counter = 0
        if self.directory:
            os.makedirs(self.directory, exist_ok=True)

    @property
    def enabled(self) -> bool:
        return bool(self.directory)

    def dump(self, name: str, array) -> None:
        if not self.enabled:
            return
        arr = np.asarray(array)
        path = os.path.join(self.directory,
                            f"{self.counter:04d}_{name}.npy")
        np.save(path, arr)
        self.counter += 1


_default = DumpRegistry()


def dump(name: str, array) -> None:
    _default.dump(name, array)


def compare_dumps(dir_a: str, dir_b: str, atol: float = 1e-2,
                  ) -> List[Tuple[str, float]]:
    """Diff two dump directories by tensor name (ignoring the counter
    prefix). Returns [(name, max_abs_diff)] for mismatches beyond atol."""

    def index(d: str) -> Dict[str, str]:
        out = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".npy"):
                name = f.split("_", 1)[1][: -len(".npy")]
                out[name] = os.path.join(d, f)
        return out

    a, b = index(dir_a), index(dir_b)
    bad = []
    for name in sorted(set(a) & set(b)):
        x, y = np.load(a[name]), np.load(b[name])
        if x.shape != y.shape:
            bad.append((name, float("inf")))
            continue
        diff = float(np.max(np.abs(x - y))) if x.size else 0.0
        if diff > atol:
            bad.append((name, diff))
    return bad
