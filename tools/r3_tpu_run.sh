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

# 6. GPTQ gs128 headline (reference README.md:65 rows)
BENCH_FORMAT=gptq BENCH_NO_EXTRA=1 timeout 1200 python -u bench.py \
    2>&1 | tail -3 | tee /tmp/bench_r3_gptq.log

# 7. full published-table sweep (7B 3/4/5bpw, 1B, 13B, GPTQ)
timeout 5400 python -u tools/bench_matrix.py 2>&1 \
    | tee /tmp/bench_r3_matrix.log

# 7b. scales-on-partials GPTQ kernel A/B (exact; tests/test_qmm.py
#     gs128 golden) — expected to clear the VPU-scale bound at gs128
QMM_PARTIALS=1 BENCH_FORMAT=gptq BENCH_NO_EXTRA=1 timeout 1200 \
    python -u bench.py 2>&1 | tail -3 | tee /tmp/bench_r3_partials.log

# 8. gs128 partial-scaled int8-dot roofline probe (perf_qmm): if the
#    batched per-group dot at K=128 clears ~600 GB/s, a GPTQ-gs128
#    decode kernel variant can beat the 400 GB/s VPU-scale bound
QMM_GROUP=128 timeout 1800 python -u tools/perf_qmm.py 2>&1 | tail -24 \
    | tee /tmp/perf_gs128.log
