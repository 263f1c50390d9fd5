"""Regenerate tests/data/pseudo_golden.npz. Run only after an intentional
numerics change; explain the change in the commit message."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU unconditionally: the fixtures must be generated on the same
# deterministic backend the tests run on (shared hardening with
# tests/conftest.py and __graft_entry__)
from tortoise_tpu.utils.runtime import force_virtual_cpu  # noqa: E402

force_virtual_cpu()

import numpy as np  # noqa: E402

from pseudo_golden_lib import DATA_PATH, compute_outputs  # noqa: E402


def main():
    out = compute_outputs()
    os.makedirs(os.path.dirname(DATA_PATH), exist_ok=True)
    np.savez_compressed(DATA_PATH, **out)
    total = sum(v.size for v in out.values())
    print(f"wrote {DATA_PATH}: {len(out)} arrays, {total} values")


if __name__ == "__main__":
    main()
