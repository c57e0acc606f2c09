"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-host-testability plan in SURVEY.md §4: sharding logic is
validated on `--xla_force_host_platform_device_count=8` CPU devices; real-TPU
behavior is covered by bench.py and the driver's compile checks.

The axon TPU tunnel must never be dialed from tests; the noaxon plugin
(pytest.ini addopts) re-execs once with a cleaned environment.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)           # tools/, util/ imports from tests

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# burst decode off by default under pytest: each burst variant is an
# extra lax.scan compile per bucket combo, which on the CPU interpreter
# pushed the generator suite past its timeout. Dedicated burst tests
# opt back in with DynamicGenerator(decode_burst=8).
os.environ.setdefault("DECODE_BURST", "1")
