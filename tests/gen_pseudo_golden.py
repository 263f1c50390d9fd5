"""Regenerate tests/data/pseudo_golden.npz. Run only after an intentional
numerics change; explain the change in the commit message."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU unconditionally: the fixtures must be generated on the same
# deterministic backend the tests run on, and the surrounding environment
# may pre-set these to point at a tunneled TPU plugin. A sitecustomize
# can register that plugin before this script runs, so (like
# tests/conftest.py) update the jax config directly and deregister the
# factory — env vars alone are captured too early to help.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

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
