#!/bin/bash
# Round-3 TPU measurement session (run when the axon tunnel is healthy).
# Sequential: ONE TPU job at a time (tunnel is single-client).
set -x
cd /root/repo

# 1. driver surface: entry() compiles + runs on the TPU
timeout 900 python -u -c "
import jax, numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location('ge', '__graft_entry__.py')
ge = importlib.util.module_from_spec(spec); spec.loader.exec_module(ge)
fn, args = ge.entry()
out = jax.jit(fn)(*args)
print('entry ok:', np.asarray(out[0]).shape)
" 2>&1 | tail -3

# 2. full bench (headline + TTFT + batch + serving rows, incremental)
timeout 1800 python -u bench.py 2>&1 | tail -6 | tee /tmp/bench_r3_base.log

# 3. merged-stream A/B (headline only, faster)
BENCH_MERGED=1 BENCH_NO_EXTRA=1 timeout 1200 python -u bench.py 2>&1 \
    | tail -3 | tee /tmp/bench_r3_merged.log

# 4. precomputed-scales A/B (headline only)
BENCH_PRESCALE=1 BENCH_NO_EXTRA=1 timeout 1200 python -u bench.py 2>&1 \
    | tail -3 | tee /tmp/bench_r3_prescale.log

# 5. both experiments together
BENCH_MERGED=1 BENCH_PRESCALE=1 BENCH_NO_EXTRA=1 timeout 1200 \
    python -u bench.py 2>&1 | tail -3 | tee /tmp/bench_r3_both.log
