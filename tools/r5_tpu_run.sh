#!/bin/bash
# Round-5 TPU measurement session. Sequential: ONE TPU job at a time
# (the tunnel is single-client). Every leg tees its result into
# docs/sessions/ so the evidence is COMMITTED, not session prose
# (VERDICT r4 weak #3).
set -x
cd /root/repo
mkdir -p docs/sessions

# 1. driver surface: entry() compiles + runs on the TPU
timeout 900 python -u -c "
import jax, numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location('ge', '__graft_entry__.py')
ge = importlib.util.module_from_spec(spec); spec.loader.exec_module(ge)
fn, args = ge.entry()
out = jax.jit(fn)(*args)
print('entry ok:', np.asarray(out[0]).shape)
" 2>&1 | tail -3 | tee docs/sessions/r5_entry.log

# 2. full default bench: prescale headline + serving rows + SLO row +
#    w4a8 + TTFT + batch + scan + A/B + sweep (the BENCH_r05 preview)
BENCH_BUDGET_S=2400 timeout 2700 python -u bench.py 2>&1 \
    | grep -v "INFO\|WARNING" | tee docs/sessions/r5_bench_full.log \
    | tail -3

# 3. GPTQ gs128: exact vs w4a8 (the int8-MXU kernel's home turf)
BENCH_FORMAT=gptq BENCH_SERVING=0 BENCH_SCAN=0 BENCH_AB=0 BENCH_SWEEP=0 \
    BENCH_STEPS=96 BENCH_BUDGET_S=900 timeout 1200 python -u bench.py \
    2>&1 | grep -v "INFO\|WARNING" \
    | tee docs/sessions/r5_w4a8_gptq_gs128_v2.log | tail -2

# 4. GPTQ gs128 merged + w4a8 (best single-stream configuration)
BENCH_FORMAT=gptq BENCH_MERGED=1 BENCH_SERVING=0 BENCH_SCAN=0 \
    BENCH_SWEEP=0 BENCH_STEPS=96 BENCH_BUDGET_S=600 timeout 900 \
    python -u bench.py 2>&1 | grep -v "INFO\|WARNING" \
    | tee docs/sessions/r5_w4a8_gptq_merged.log | tail -2

# 5. w4a8 kernel roofline probes (production kernel vs isolated form)
QMM_GROUP=128 timeout 1700 python -u tools/perf_qmm.py w4a8_kernel 2>&1 \
    | grep -v "INFO\|WARNING" | tee docs/sessions/r5_perf_w4a8_gs128.log
QMM_GROUP=128 timeout 1700 python -u tools/perf_qmm.py gp_int8 2>&1 \
    | grep -v "INFO\|WARNING" | tee -a docs/sessions/r5_perf_w4a8_gs128.log

# 6. feature smoke on the real chip
timeout 1200 python -u tools/tpu_feature_smoke.py 2>&1 | tail -20 \
    | tee docs/sessions/r5_feature_smoke.log
