"""pytest bootstrap plugin: never dial the axon TPU tunnel from tests.

Loaded via `addopts = -p noaxon` (pytest.ini). With
`PALLAS_AXON_POOL_IPS` set, the sitecustomize PJRT registration can
block `import jax` indefinitely when the tunnel is wedged (and adds
startup cost even when healthy); registration happens at interpreter
startup — before any pytest code — so the only reliable fix is one
re-exec with a cleaned environment.

The re-exec happens inside pytest_load_initial_conftests (not at module
import): pytest's fd-level capture is already active by the time plugin
code runs, so a bare execve would leave the new interpreter writing
into pytest's temp capture files and all test output would vanish.
Suspending global capture first restores the real stdout/stderr fds,
which the exec'd process then inherits.
"""

import os
import sys

import pytest


@pytest.hookimpl(trylast=True)
def pytest_load_initial_conftests(early_config, parser, args):
    if os.environ.get("NOAXON_REEXECED") == "1":
        return
    dirty = (os.environ.get("PALLAS_AXON_POOL_IPS")
             or os.environ.get("JAX_PLATFORMS", "").startswith("axon"))
    if not dirty:
        return
    # NOTE: sitecustomize imports jax while registering the axon PJRT
    # plugin, so "jax" in sys.modules is NOT a usable re-exec guard (it
    # is always true); the NOAXON_REEXECED env var is the loop guard.
    # Re-exec is safe even with jax imported — the new interpreter
    # starts clean with the axon vars stripped.
    capman = early_config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
        except Exception:
            pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["NOAXON_REEXECED"] = "1"
    # `python -m pytest ...` => sys.argv[1:] are the pytest args; a
    # `pytest ...` console script re-execs identically
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
