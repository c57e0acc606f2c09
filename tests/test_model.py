"""End-to-end model tests against the numpy reference and cache invariants."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np
import pytest

from exllamav2_tpu.models.model import Model
from exllamav2_tpu.utils.testing import make_tiny_llama

from ref_llama import llama_forward


@pytest.fixture(scope="module")
def fp16_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_fp16")
    return make_tiny_llama(str(d), quant=None, seed=1)


@pytest.fixture(scope="module")
def exl2_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_exl2")
    return make_tiny_llama(str(d), quant="exl2", seed=2)


@pytest.fixture(scope="module")
def gptq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_gptq")
    return make_tiny_llama(str(d), quant="gptq", seed=3)


def _rel_err(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def test_fp16_forward_matches_numpy(fp16_dir):
    model = Model.from_dir(fp16_dir)
    ids = np.array([[3, 17, 200, 9, 55, 123, 42, 7]], np.int32)
    cache = model.new_cache(batch=1, max_seq=32)
    logits, _ = model.forward(ids, cache, 0)
    ref = llama_forward(fp16_dir, ids)
    assert _rel_err(np.asarray(logits), ref) < 0.03


@pytest.mark.parametrize("fix", ["exl2_dir", "gptq_dir"])
def test_quant_forward_matches_numpy(fix, request):
    d = request.getfixturevalue(fix)
    model = Model.from_dir(d)
    ids = np.array([[3, 17, 200, 9, 55, 123, 42, 7]], np.int32)
    cache = model.new_cache(batch=1, max_seq=32)
    logits, _ = model.forward(ids, cache, 0)
    ref = llama_forward(d, ids)   # numpy dequant reference
    assert _rel_err(np.asarray(logits), ref) < 0.03


def test_decode_matches_prefill(fp16_dir):
    """Token-by-token decode with cache == full-sequence forward."""
    model = Model.from_dir(fp16_dir)
    ids = np.array([[5, 99, 180, 7, 31, 64]], np.int32)
    cache = model.new_cache(batch=1, max_seq=16)
    full_logits, _ = model.forward(ids, cache, 0)
    full_logits = np.asarray(full_logits)

    cache = model.new_cache(batch=1, max_seq=16)
    step_logits = []
    for i in range(ids.shape[1]):
        lg, cache = model.forward(ids[:, i:i + 1], cache, i)
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    assert _rel_err(step_logits, full_logits) < 0.02


def test_greedy_generation_consistency(exl2_dir):
    """Greedy gen then re-scoring the full sequence reproduces the tokens."""
    model = Model.from_dir(exl2_dir)
    prompt = np.array([[1, 50, 99]], np.int32)
    seq = model.generate_greedy(prompt, 8, max_seq=32)
    assert seq.shape == (1, 11)
    cache = model.new_cache(batch=1, max_seq=32)
    logits, _ = model.forward(seq, cache, 0)
    pred = np.argmax(np.asarray(logits)[0, 2:-1], axis=-1)
    assert (pred == seq[0, 3:]).all()


def test_batched_forward(fp16_dir):
    model = Model.from_dir(fp16_dir)
    ids = np.array([[3, 17, 200, 9], [1, 2, 3, 4]], np.int32)
    cache = model.new_cache(batch=2, max_seq=16)
    logits, _ = model.forward(ids, cache, 0)
    ref = llama_forward(fp16_dir, ids)
    assert _rel_err(np.asarray(logits), ref) < 0.03


def test_gqa_and_act_order(tmp_path):
    d = make_tiny_llama(str(tmp_path / "m"), quant="exl2", seed=7,
                        act_order=True, heads=8, kv_heads=2, hidden=256)
    model = Model.from_dir(d)
    ids = np.array([[11, 22, 33, 44]], np.int32)
    cache = model.new_cache(batch=1, max_seq=8)
    logits, _ = model.forward(ids, cache, 0)
    ref = llama_forward(d, ids)
    assert _rel_err(np.asarray(logits), ref) < 0.03


def test_sparse_moe_matches_dense(tmp_path):
    """The cond-gated sparse MoE decode path must match the dense
    all-experts formulation exactly (VERDICT: decode FLOPs ~ top-k)."""
    import jax
    import jax.numpy as jnp
    from exllamav2_tpu.models import forward as FWD
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.utils.testing import make_tiny_llama

    d = make_tiny_llama(str(tmp_path / "m"), quant=None, seed=61,
                        arch="MixtralForCausalLM", hidden=128, inter=128,
                        heads=2, kv_heads=2,
                        extra_config={"num_local_experts": 4,
                                      "num_experts_per_tok": 2})
    model = Model.from_dir(str(d))
    lw = model.weights.layers[0]
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 128), jnp.bfloat16)
    dense = FWD.moe_forward(x, lw.mlp, model.static)
    FWD._FORCE_SPARSE_MOE[0] = True
    try:
        sparse = jax.jit(
            lambda x: FWD.moe_forward(x, lw.mlp, model.static))(x)
    finally:
        FWD._FORCE_SPARSE_MOE[0] = False
    import numpy as np
    a, b = np.asarray(dense, np.float32), np.asarray(sparse, np.float32)
    assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def test_chunked_long_input_forward(tmp_path):
    """Inputs beyond max_input_len stream through in chunks and match the
    single-shot forward (reference model.py:873-895 chunking)."""
    import dataclasses
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.utils.testing import make_tiny_llama

    d = make_tiny_llama(str(tmp_path / "m"), quant=None, seed=71,
                        vocab=384, max_pos=512)
    model = Model.from_dir(str(d))
    ids = np.random.default_rng(0).integers(3, 250, (1, 96)).astype(
        np.int32)

    cache1 = model.new_cache(1, 128)
    ref, _ = model.forward(ids, cache1, 0)

    model.config.max_input_len = 32       # force 3 chunks
    cache2 = model.new_cache(1, 128)
    got, _ = model.forward(ids, cache2, 0)
    a, b = np.asarray(ref), np.asarray(got)
    assert a.shape == b.shape
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.02, rel

    # last-token-only mode across chunks
    cache3 = model.new_cache(1, 128)
    last, _ = model.forward(ids, cache3, 0, last_token_only=True)
    rel2 = np.abs(np.asarray(last)[:, 0] - a[:, -1]).max() / \
        (np.abs(a[:, -1]).max() + 1e-9)
    assert rel2 < 0.02, rel2


def test_moe_capacity_dispatch_matches_dense():
    """The prefill capacity-dispatch path (static [E, C] buffers,
    gather/scatter combine) must match the dense-mix formulation exactly
    when no routes overflow capacity."""
    import jax.numpy as jnp
    from exllamav2_tpu.utils.testing import random_model_weights
    from exllamav2_tpu.models import forward as F

    w, st = random_model_weights(vocab=128, hidden=128, layers=1, heads=4,
                                 kv_heads=2, inter=128, max_seq=64, bits=4,
                                 seed=5, moe=4, moe_topk=2)
    mw = w.layers[0].mlp
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 160, 128)) * 0.1,
        jnp.bfloat16)                       # bt=320 -> dispatch path
    y_disp = np.asarray(F.moe_forward(x, mw, st))
    F._MOE_DISPATCH_MIN_TOKENS[0] = 10 ** 9
    try:
        y_dense = np.asarray(F.moe_forward(x, mw, st))
    finally:
        F._MOE_DISPATCH_MIN_TOKENS[0] = 64
    rel = np.abs(y_disp - y_dense).max() / (np.abs(y_dense).max() + 1e-9)
    assert rel < 5e-3, rel


def test_forward_with_hooks_intervention():
    """Layer hooks (Intervention analog): identity hooks must not change
    logits; a zeroing pre-hook on layer 0 must."""
    import jax.numpy as jnp
    from exllamav2_tpu.utils.testing import make_tiny_llama
    from exllamav2_tpu.models.model import Model

    m = Model.from_dir(make_tiny_llama("/tmp/hooks_m", quant=None, seed=31))
    ids = np.array([[3, 17, 99, 9]], np.int32)
    base, _ = m.forward(ids, m.new_cache(batch=1, max_seq=16), 0)
    same, _ = m.forward_with_hooks(
        ids, m.new_cache(batch=1, max_seq=16), 0,
        post_hooks={0: lambda x: x})
    rel = (np.abs(np.asarray(base) - np.asarray(same)).max()
           / (np.abs(np.asarray(base)).max() + 1e-9))
    assert rel < 2e-2, rel
    diff, _ = m.forward_with_hooks(
        ids, m.new_cache(batch=1, max_seq=16), 0,
        pre_hooks={0: lambda x: x * 0.0})
    assert np.abs(np.asarray(diff) - np.asarray(base)).max() > 1e-3


def test_rank_reduce():
    """SVD rank reduction (reference linear.py rank_reduce analog)."""
    from exllamav2_tpu.utils.rank_reduce import (
        rank_reduce_weight, rank_reduce_model)
    from exllamav2_tpu.utils.testing import random_model_weights

    w = np.random.default_rng(3).standard_normal((64, 48)).astype(np.float32)
    r = rank_reduce_weight(w, 0.25)
    assert np.linalg.matrix_rank(r) == 12
    mw, _ = random_model_weights(vocab=64, hidden=64, layers=1, heads=2,
                                 kv_heads=2, inter=64, max_seq=32,
                                 seed=3, dense=True)
    mw2 = rank_reduce_model(mw, 0.5)
    a = np.asarray(mw2.layers[0].mlp.down.weight, np.float32)
    assert np.linalg.matrix_rank(a, tol=1e-3) <= 32


def test_merged_serving_weights_match():
    """Merged qkv / gate_up decode fast path (ops/dequant.
    merge_serving_weights): outputs match the unmerged model. The merge
    is bitwise-exact on the dequantized weights (per-source smax columns
    selected in-kernel); only the f32 accumulation order may differ with
    the wider tiles, so compare within a tight relative tolerance."""
    import jax
    import jax.numpy as jnp
    from exllamav2_tpu.models import forward as F
    from exllamav2_tpu.ops.dequant import merge_serving_weights
    from exllamav2_tpu.utils.testing import random_model_weights
    from exllamav2_tpu.cache import KVCache

    w, st = random_model_weights(
        vocab=512, hidden=256, layers=2, heads=8, kv_heads=4,
        inter=512, max_seq=64, bits=4, seed=9)
    wm = merge_serving_weights(w)
    assert wm.layers[0].attn.qkv is not None
    assert wm.layers[0].mlp.gate_up is not None

    ids = jnp.asarray(np.random.default_rng(0).integers(
        3, 500, (1, 8)).astype(np.int32))

    def run(weights):
        cache = KVCache.alloc(st.num_layers, 1, 64, st.num_kv_heads,
                              st.head_dim)
        logits, _ = jax.jit(F.model_forward, static_argnums=(1,))(
            weights, st, ids, cache, jnp.int32(0))
        return np.asarray(logits)

    a, b = run(w), run(wm)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.02, rel


def test_prescaled_weights_match():
    """Precomputed bf16 group scales (ops/dequant.precompute_model_scales,
    the BENCH_PRESCALE decode experiment): every linear — plain and
    column-merged (src_cols smax expansion), fused kernel and unfused
    fallback — matches the in-kernel sqrt decode within the one extra
    bf16 scale rounding. (Model-level logits are NOT compared: a ~0.3%
    per-weight rounding amplifies chaotically through untrained random
    layers, unlike the bitwise-exact merged-weights transform above.)"""
    import jax.numpy as jnp
    from exllamav2_tpu.ops import qmm
    from exllamav2_tpu.ops.dequant import (merge_serving_weights,
                                           precompute_model_scales)
    from exllamav2_tpu.utils.testing import random_model_weights

    w, st = random_model_weights(
        vocab=512, hidden=256, layers=1, heads=8, kv_heads=4,
        inter=512, max_seq=64, bits=4, seed=9)
    wp = precompute_model_scales(w)
    assert wp.layers[0].attn.q.segments[0].scale_f is not None
    # merged + prescaled composes (merged smax is per-source columns)
    wmp = precompute_model_scales(merge_serving_weights(w))
    assert wmp.layers[0].attn.qkv.segments[0].scale_f is not None

    wm = merge_serving_weights(w)
    pairs = [(w.layers[0].attn.q, wp.layers[0].attn.q),
             (w.layers[0].attn.o, wp.layers[0].attn.o),
             (w.layers[0].mlp.down, wp.layers[0].mlp.down),
             (wm.layers[0].attn.qkv, wmp.layers[0].attn.qkv),
             (wm.layers[0].mlp.gate_up, wmp.layers[0].mlp.gate_up)]
    rng = np.random.default_rng(1)
    for base, pre in pairs:
        x = jnp.asarray(rng.standard_normal((1, base.k)), jnp.float32)
        for fused in (True, False):
            a = np.asarray(qmm.qmm(x, base, fused=fused))
            b = np.asarray(qmm.qmm(x, pre, fused=fused))
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            assert rel < 0.01, (fused, rel)
