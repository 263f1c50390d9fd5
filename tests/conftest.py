"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require the real TPU; sharding tests use the virtual devices.
All the environmental hardening (replacing a pre-existing device-count
flag, pinning jax.config past a sitecustomize-registered TPU plugin,
clearing PALLAS_AXON_POOL_IPS for subprocesses) lives in
tortoise_tpu.utils.runtime.force_virtual_cpu — shared with
tests/gen_pseudo_golden.py and __graft_entry__.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tortoise_tpu.utils.runtime import force_virtual_cpu  # noqa: E402

force_virtual_cpu(n_devices=8)
