"""pytest bootstrap plugin: never dial the axon TPU tunnel from tests.

Loaded via `addopts = -p noaxon` (pytest.ini) BEFORE pytest's fd capture
starts, so the re-exec'd interpreter keeps the real stdout/stderr. With
`PALLAS_AXON_POOL_IPS` set, the sitecustomize PJRT registration can block
`import jax` indefinitely when the tunnel is wedged (and adds startup
cost even when healthy); registration happens at interpreter startup —
before any pytest code — so the only reliable fix is one re-exec with a
cleaned environment.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and "jax" not in sys.modules:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # `python -m pytest ...` => sys.argv[1:] are the pytest args; a
    # `pytest ...` console script re-execs identically
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
