"""W4A8 opt-in decode path: int8-MXU scales-on-partials kernel.

The mode trades exactness for HBM rate (601 vs 376 GB/s probed on v5e,
docs/DESIGN.md round-4 study): activations quantize to per-token
per-group absmax int8 and the 4-bit weight values feed the MXU as int8
with scale/zero fixups on the group partials. These tests pin the
kernel's arithmetic to a numpy emulation of exactly that scheme (tight
tolerance) and bound its end-to-end deviation from the exact path.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from exllamav2_tpu.quant import formats as F
from exllamav2_tpu.quant import qtensor as Q
from exllamav2_tpu.ops import qmm as M
from exllamav2_tpu.ops import dequant as D


def _exl2_layer(rng, k, n, bits_per_group, gs=32, act_order=False):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    if act_order:
        perm = rng.permutation(k)
        t = F.exl2_pack(w[perm], bits_per_group, group_rows=gs,
                        invperm=np.argsort(perm))
    else:
        t = F.exl2_pack(w, bits_per_group, group_rows=gs)
    return F.exl2_dequantize(t), Q.from_exl2(t)


def _act_quant_dequant(x, gs):
    """Numpy emulation of the kernel's per-token per-group absmax int8
    activation codec (quantize then dequantize)."""
    m, k = x.shape
    g = k // gs
    xg = x.reshape(m, g, gs).astype(np.float32)
    amax = np.abs(xg).max(axis=2)
    a = amax / 127.0
    aq = np.where(amax > 0, a, 1.0)
    xq = np.clip(np.round(xg / aq[:, :, None]), -127, 127)
    return (xq * a[:, :, None]).reshape(m, k).astype(np.float32)


def _w4a8_ref(x, lin):
    """y = act_qdq(x) @ dequant(lin) — algebraically identical to the
    kernel (scales distribute over the group partials)."""
    xp = np.asarray(x, np.float32)
    if lin.perm is not None:
        xp = xp[:, np.asarray(lin.perm)]
    y = None
    col = 0
    for seg in lin.segments:
        xs = xp[:, col:col + seg.rows]
        if seg.rows < seg.rows_pad:
            xs = np.pad(xs, ((0, 0), (0, seg.rows_pad - seg.rows)))
        xdq = _act_quant_dequant(xs, seg.group_rows)
        wdq = np.asarray(D.dequant_segment(seg, dtype=jnp.float32,
                                           rows=seg.rows_pad))
        part = xdq @ wdq
        y = part if y is None else y + part
        col += seg.rows
    return y


@pytest.mark.parametrize("m", [1, 4, 17])
@pytest.mark.parametrize("bits", [2, 4, 5])
def test_w4a8_matches_emulation(m, bits):
    rng = np.random.default_rng(bits * 100 + m)
    k, n = 256, 128
    _, ql = _exl2_layer(rng, k, n, [bits] * (k // 32))
    ql = D.enable_w4a8_linear(ql)
    assert all(s.act8 for s in ql.segments)
    x = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    expect = _w4a8_ref(x, ql)
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=True))[:, :n]
    np.testing.assert_allclose(got, expect[:, :n], rtol=1e-4, atol=1e-5)


def test_w4a8_mixed_segments_with_8bit():
    """8-bit values sit in [0, 255]: the kernel shifts them by 128 into
    int8 range and cancels the shift in the zero-point term."""
    rng = np.random.default_rng(7)
    k, n = 256, 128
    _, ql = _exl2_layer(rng, k, n, [8, 8, 4, 4, 3, 3, 2, 2])
    ql = D.enable_w4a8_linear(ql)
    x = rng.standard_normal((3, k)).astype(np.float32) * 0.1
    expect = _w4a8_ref(x, ql)
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=True))[:, :n]
    np.testing.assert_allclose(got, expect[:, :n], rtol=1e-4, atol=1e-5)


def test_w4a8_act_order():
    rng = np.random.default_rng(3)
    k, n = 256, 128
    _, ql = _exl2_layer(rng, k, n, [4] * 8, act_order=True)
    ql = D.enable_w4a8_linear(ql)
    x = rng.standard_normal((2, k)).astype(np.float32) * 0.1
    expect = _w4a8_ref(x, ql)
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=True))[:, :n]
    np.testing.assert_allclose(got, expect[:, :n], rtol=1e-4, atol=1e-5)


def test_w4a8_gptq():
    """GPTQ w4a8 uses the compressed bf16 meta (scale_bf + zs_bf): the
    emulation mirrors that algebra exactly — partials scale by bf16(s),
    the zero term subtracts x1a * bf16((z-off)*s)."""
    import jax
    rng = np.random.default_rng(4)
    k, n, gs = 256, 128, 64
    g = k // gs
    qv = rng.integers(0, 16, size=(k, n)).astype(np.uint16)
    zeros = rng.integers(4, 12, size=(g, n)).astype(np.uint16)
    scales = rng.random((g, n)).astype(np.float32) * 0.02 + 0.001
    t = F.gptq_pack(qv, zeros, scales, bits=4)
    ql = D.enable_w4a8_linear(Q.from_gptq(t))
    seg = ql.segments[0]
    assert seg.act8 and seg.scale_bf is not None

    x = rng.standard_normal((2, k)).astype(np.float32) * 0.1
    m = x.shape[0]
    rows_pad = seg.rows_pad
    xs = np.pad(x, ((0, 0), (0, rows_pad - k)))
    gt = rows_pad // gs
    xg = xs.reshape(m, gt, gs)
    amax = np.abs(xg).max(axis=2)
    a = amax / 127.0
    aq = np.where(amax > 0, a, 1.0)
    xq = np.clip(np.round(xg / aq[:, :, None]), -127, 127)
    vals = Q.unpack_planes_np([np.asarray(p) for p in seg.planes],
                              seg.bits, n).astype(np.float64)
    s_bf = np.asarray(seg.scale_bf, np.float32)
    zs_bf = np.asarray(seg.zs_bf, np.float32)
    expect = np.zeros((m, n))
    for gi in range(gt):
        p = xq[:, gi] @ vals[gi * gs:(gi + 1) * gs, :n]   # [m, n]
        x1a = xq[:, gi].sum(axis=1) * a[:, gi]            # [m]
        expect += (p * a[:, gi:gi + 1]) * s_bf[gi, :n] \
            - x1a[:, None] * zs_bf[gi, :n]
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=True))[:, :n]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_w4a8_close_to_exact():
    """End-to-end deviation from the exact kernel stays within the
    per-group int8 quantization noise envelope."""
    rng = np.random.default_rng(5)
    k, n = 512, 256
    golden_w, ql = _exl2_layer(rng, k, n, [4] * (k // 32))
    x = rng.standard_normal((4, k)).astype(np.float32) * 0.1
    exact = np.asarray(M.qmm(jnp.asarray(x),
                             D.precompute_scales_linear(ql),
                             fused=True))[:, :n]
    got = np.asarray(M.qmm(jnp.asarray(x), D.enable_w4a8_linear(ql),
                           fused=True))[:, :n]
    scale = np.abs(exact).mean() + 1e-6
    rel = np.abs(got - exact).mean() / scale
    assert rel < 0.02, f"mean relative deviation {rel:.4f}"


def test_w4a8_prefill_path_stays_exact():
    """The unfused (prefill) path ignores act8 — prefill is MXU-bound
    and stays on exact dequant semantics."""
    rng = np.random.default_rng(6)
    k, n = 256, 128
    golden_w, ql = _exl2_layer(rng, k, n, [4] * 8)
    qa = D.enable_w4a8_linear(ql)
    x = rng.standard_normal((64, k)).astype(np.float32) * 0.1
    got = np.asarray(M.qmm(jnp.asarray(x), qa, fused=False))[:, :n]
    np.testing.assert_allclose(got, x @ golden_w, rtol=2e-2, atol=2e-2)


def test_w4a8_merge_roundtrip():
    """merge_linears on act8 sources re-prescales the merged segment
    (set_loras re-merges on adapter detach), and the merged w4a8 matmul
    matches the per-source results."""
    rng = np.random.default_rng(8)
    k = 256
    _, qa = _exl2_layer(rng, k, 128, [4] * 8)
    _, qb = _exl2_layer(rng, k, 128, [4] * 8)
    qa, qb = D.enable_w4a8_linear(qa), D.enable_w4a8_linear(qb)
    merged = D.merge_linears([qa, qb])
    assert merged is not None
    assert all(s.act8 and s.scale_f is not None for s in merged.segments)
    x = rng.standard_normal((2, k)).astype(np.float32) * 0.1
    import jax.numpy as jnp
    ya = np.asarray(M.qmm(jnp.asarray(x), qa, fused=True))[:, :128]
    yb = np.asarray(M.qmm(jnp.asarray(x), qb, fused=True))[:, :128]
    ym = np.asarray(M.qmm(jnp.asarray(x), merged, fused=True))
    np.testing.assert_allclose(ym[:, :128], ya, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ym[:, 128:256], yb, rtol=1e-5, atol=1e-6)


def test_enable_w4a8_model_tree():
    """enable_w4a8 flips every layer linear but keeps the lm_head exact."""
    from exllamav2_tpu.utils.testing import random_model_weights
    w, st = random_model_weights(max_seq=64, bits=4, seed=0, vocab=256,
                                 hidden=256, layers=2, heads=4,
                                 kv_heads=4, inter=512)
    w8 = D.enable_w4a8(w)
    q = w8.layers[0].attn.q
    assert all(s.act8 for s in q.segments)
    assert all(s.scale_f is not None for s in q.segments)
    if hasattr(w8.head, "segments"):
        assert not any(getattr(s, "act8", False)
                       for s in w8.head.segments)


def test_w4a8_kt_padding_exact():
    """_pad_w4a8_rows zero-pads awkward K (rows_pad not a multiple of
    lcm(SUB_BLOCK, 8*gr)) so the tile picker gets kt=1024 instead of
    the whole-K fallback (on-chip: 460 -> 713 GB/s on the 7B down_proj
    shape). The padded kernel must agree with the unpadded one — the
    extra rows carry zero activations, so every added partial is zero."""
    rng = np.random.default_rng(9)
    k, n, gs = 8960, 128, 128       # rows_pad 8960 % 1024 = 768 -> 9216
    g = k // gs
    qv = rng.integers(0, 16, size=(k, n)).astype(np.uint16)
    zeros = rng.integers(4, 12, size=(g, n)).astype(np.uint16)
    scales = rng.random((g, n)).astype(np.float32) * 0.02 + 0.001
    t = F.gptq_pack(qv, zeros, scales, bits=4)
    base = Q.from_gptq(t)
    padded = D.enable_w4a8_linear(base)
    assert padded.segments[0].rows_pad == 9216
    assert padded.segments[0].rows == base.segments[0].rows
    unpadded = D.enable_w4a8_linear(base)
    import dataclasses
    unpadded = dataclasses.replace(
        unpadded,
        segments=tuple(
            dataclasses.replace(
                s,
                planes=base.segments[i].planes,
                scale=base.segments[i].scale,
                zero=base.segments[i].zero,
                scale_bf=s.scale_bf[:base.segments[i].scale.shape[0]],
                zs_bf=s.zs_bf[:base.segments[i].scale.shape[0]])
            for i, s in enumerate(unpadded.segments)))
    x = rng.standard_normal((2, k)).astype(np.float32) * 0.1
    yp = np.asarray(M.qmm(jnp.asarray(x), padded, fused=True))[:, :n]
    yu = np.asarray(M.qmm(jnp.asarray(x), unpadded, fused=True))[:, :n]
    np.testing.assert_allclose(yp, yu, rtol=1e-5, atol=1e-6)
    # a small-K segment must NOT pad (overhead > 12.5%)
    _, small = _exl2_layer(rng, 256, 128, [4] * 2, gs=128)
    # (EXL2 path: padding only applies to GPTQ segments)
    sm = D.enable_w4a8_linear(small)
    assert sm.segments[0].rows_pad == small.segments[0].rows_pad


def test_w4a8_flagship_chain_gptq_merged():
    """The flagship bench leg's exact weight-prep chain (GPTQ gs128 ->
    merge_serving_weights -> precompute_model_scales -> enable_w4a8;
    bench.py `w4a8_gptq_gs128_tokens_per_s`) decodes within the int8
    activation noise envelope of the exact forward."""
    import functools
    import jax
    from exllamav2_tpu.utils.testing import random_model_weights
    from exllamav2_tpu.models.forward import model_forward
    from exllamav2_tpu.cache import KVCache

    w, st = random_model_weights(max_seq=64, bits=4, seed=3, fmt="gptq",
                                 vocab=512, hidden=256, layers=2,
                                 heads=4, kv_heads=4, inter=512)
    wf = D.enable_w4a8(D.precompute_model_scales(
        D.merge_serving_weights(w)))
    q = wf.layers[0].attn.q
    assert all(s.act8 for s in q.segments)

    @functools.partial(jax.jit, static_argnums=(4,))
    def step(wv, tok, cache, past_len, attn_limit):
        logits, cache = model_forward(wv, st, tok, cache, past_len,
                                      attn_limit=attn_limit)
        return logits, cache

    def run(wv):
        cache = KVCache.alloc(st.num_layers, 1, 64, st.num_kv_heads,
                              st.head_dim)
        tok = jnp.ones((1, 1), jnp.int32)
        outs = []
        for i in range(4):
            logits, cache = step(wv, tok, cache, jnp.int32(8 + i), 64)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(
                jnp.int32)[:, None]
            outs.append(np.asarray(logits[:, -1, :]))
        return np.stack(outs)

    exact = run(D.precompute_model_scales(w))
    got = run(wf)
    scale = np.abs(exact).mean() + 1e-6
    rel = np.abs(got - exact).mean() / scale
    assert rel < 0.05, f"mean relative logit deviation {rel:.4f}"
    # greedy path agreement on the fixture
    assert (exact.argmax(-1) == got.argmax(-1)).all()


@pytest.mark.slow
def test_w4a8_gs128_convert_serve(tmp_path):
    """The product recipe for the int8-MXU decode mode: convert with
    group_size=128 (`convert.py -gs 128` — W4A8-friendly scale groups),
    serve with w4a8 — the mode only pays at gs>=128 (docs/DESIGN.md
    round-5: +22% on-chip vs the exact path at 7B GPTQ-gs128, parity at
    gs32). Asserts the converted checkpoint really carries gs128
    segments and that the w4a8 decode path tracks the exact path."""
    import jax
    from exllamav2_tpu.convert.pipeline import convert_model
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.utils.testing import make_tiny_llama

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    make_tiny_llama(src, quant=None, seed=11, vocab=256, hidden=256,
                    layers=2, heads=4, kv_heads=2, inter=512, max_pos=512)
    convert_model(src, out, bits=4.0, cal_rows=2, cal_len=64,
                  group_size=128, progress=lambda *a: None)
    exact = Model.from_dir(out)
    segs = exact.weights.layers[0].attn.q.segments
    assert all(s.group_rows == 128 for s in segs), \
        [s.group_rows for s in segs]

    m8 = Model(D.enable_w4a8(exact.weights), exact.static, exact.config)
    ids = np.array([[3, 17, 200, 9, 55, 123]], np.int32)
    # decode path (m=1 fused kernels): teacher-force a short row
    la, lb = [], []
    ca = exact.new_cache(batch=1, max_seq=16)
    cb = m8.new_cache(batch=1, max_seq=16)
    for t in range(ids.shape[1]):
        a, ca = exact.forward(ids[:, t:t + 1], ca, t)
        b, cb = m8.forward(ids[:, t:t + 1], cb, t)
        la.append(np.asarray(a, np.float32).ravel())
        lb.append(np.asarray(b, np.float32).ravel())
    pa = jax.nn.log_softmax(jnp.asarray(np.stack(la)), axis=-1)
    pb = jax.nn.log_softmax(jnp.asarray(np.stack(lb)), axis=-1)
    kld = np.asarray(jnp.sum(jnp.exp(pa) * (pa - pb), axis=-1))
    assert kld.mean() < 2e-2, kld


def test_from_dir_prescale_opt_out_respected_by_generator(tmp_path):
    """Model.from_dir(prescale=False) is an explicit bitwise-golden
    opt-out; DynamicGenerator's own prescale default must not silently
    re-apply it (code-review r5 finding)."""
    from exllamav2_tpu.cache_paged import PagedKVCache
    from exllamav2_tpu.generator.dynamic import DynamicGenerator
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.tokenizer import ByteTokenizer
    from exllamav2_tpu.utils.testing import make_tiny_llama

    d = make_tiny_llama(str(tmp_path / "m"), quant="exl2", seed=3,
                        vocab=384)
    m = Model.from_dir(d, prescale=False)

    def cache():
        return PagedKVCache.alloc(m.static.num_layers, 4,
                                  m.static.num_kv_heads,
                                  m.static.head_dim, "bf16")

    gen = DynamicGenerator(m, cache(), ByteTokenizer(384))
    q = gen.model.weights.layers[0].attn.q
    assert all(s.scale_f is None for s in q.segments), \
        "generator re-applied prescale over an explicit opt-out"
    # explicit prescale=True still wins over the model's opt-out
    gen2 = DynamicGenerator(m, cache(), ByteTokenizer(384), prescale=True)
    q2 = gen2.model.weights.layers[0].attn.q
    assert all(s.scale_f is not None for s in q2.segments)
