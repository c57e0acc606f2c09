"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-host-testability plan in SURVEY.md §4: sharding logic is
validated on `--xla_force_host_platform_device_count=8` CPU devices; real-TPU
behavior is covered by bench.py and the driver's compile checks.

The axon TPU tunnel must never be dialed from tests: with
`PALLAS_AXON_POOL_IPS` set, the sitecustomize PJRT registration can block
`import jax` indefinitely when the tunnel is wedged (and adds per-process
startup cost even when healthy). The registration happens at interpreter
startup — before this file runs — so the only reliable fix is to re-exec
the interpreter once with a cleaned environment.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # `python -m pytest ...` => sys.argv[0] is pytest's __main__ path and
    # sys.argv[1:] are the pytest args; plain `pytest ...` re-execs the
    # console script the same way
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)           # tools/, util/ imports from tests

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
