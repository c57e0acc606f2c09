#!/bin/bash
# Round-4 TPU measurement session (run when the axon tunnel is healthy).
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

# 2. full bench: headline + TTFT + batch + serving + A/B + sweep rows
BENCH_BUDGET_S=3000 timeout 3300 python -u bench.py 2>&1 | tail -4 \
    | tee /tmp/bench_r4_base.log

# 3. GPTQ gs128 headline (standard kernel, post sublane fix)
BENCH_FORMAT=gptq BENCH_NO_EXTRA=1 BENCH_AB=0 timeout 1500 \
    python -u bench.py 2>&1 | tail -2 | tee /tmp/bench_r4_gptq.log

# 4. scales-on-partials A/B (measured r4: 96.61 vs 97.34 — refuted,
#    kept for regression tracking)
QMM_PARTIALS=1 BENCH_FORMAT=gptq BENCH_NO_EXTRA=1 BENCH_AB=0 timeout 1500 \
    python -u bench.py 2>&1 | tail -2 | tee /tmp/bench_r4_partials.log

# 5. real-converted-checkpoint serve: convert on this backend, serve on
#    TPU recording logits, teacher-force the tokens on CPU, check
#    per-step logit agreement + argmax-or-tie (VERDICT r3 item 6)
rm -rf /tmp/r4_csc && mkdir -p /tmp/r4_csc
env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
    -u AXON_LOOPBACK_RELAY JAX_PLATFORMS=cpu timeout 1200 \
    python -u tools/convert_serve_check.py --prepare /tmp/r4_csc
timeout 1800 python -u tools/convert_serve_check.py \
    --serve /tmp/r4_csc --cache q4 --logits /tmp/r4_tpu.json 2>&1 | tail -1
env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
    -u AXON_LOOPBACK_RELAY JAX_PLATFORMS=cpu timeout 1800 \
    python -u tools/convert_serve_check.py --serve /tmp/r4_csc --cache q4 \
    --logits /tmp/r4_cpu.json --force /tmp/r4_tpu.json 2>&1 | tail -1
python tools/convert_serve_check.py --check /tmp/r4_tpu.json \
    /tmp/r4_cpu.json | tee docs/R4_CONVERT_SERVE_CHECK.json

# 6. repaired gs128 roofline probe (tunnel-noise-resistant iteration
#    counts; full failure tails)
QMM_GROUP=128 timeout 2400 python -u tools/perf_qmm.py 2>&1 | tail -12 \
    | tee /tmp/perf_r4_gs128.log

# 7. real-TPU feature smokes: ngram + draft spec decode (greedy-equal),
#    CFG, q4/q8/q6/fp8 cache serving — prior evidence was CPU-only
timeout 2700 python -u tools/tpu_feature_smoke.py 2>&1 | tail -10
