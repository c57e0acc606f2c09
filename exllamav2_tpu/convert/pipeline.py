"""EXL2 conversion pipeline: measure -> optimize -> quantize -> compile.

Analog of the reference's conversion/ package + convert_exl2.py job state
machine (convert_exl2.py:228-316): calibration forward with captured
intermediates (measure.py), per-module candidate measurement (RTN fast
path), global bit allocation by simulated annealing + greedy top-up
(optimize.py:105-158, ext_c.sim_anneal), Hessian-aware GPTQ quantization
with reconstruction sanity check (quantize.py:50-132), lm_head
quantization at head_bits (quantize.py:443-543), and final safetensors
assembly (compile.py).

Module coverage is architecture-derived (measure.py:577-605 equivalents):
MoE experts, fused qkv / gate_up (unfused on output like the reference),
ungated MLPs, parallel-decoder blocks and biased layers all convert.

Resumable per stage AND per layer: measurement.json persists candidate
errors incrementally; the quantize stage writes one safetensors file per
layer under out_dir/quant/ and re-derives propagation states from them on
resume. Captured activations live only for the layer being processed.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from exllamav2_tpu.config import ModelConfig
from exllamav2_tpu.convert.gptq import AdaptiveGPTQ
from exllamav2_tpu.convert.qparams import (
    QParams, qparams_attn, qparams_mlp, qparams_head_for)
from exllamav2_tpu.models.loader import load_model
from exllamav2_tpu.models.modules import MoEWeights
from exllamav2_tpu.models.forward import norm_apply, _attn_qkv, _act
from exllamav2_tpu.ops.qmm import linear_apply
from exllamav2_tpu.quant import formats as F
from exllamav2_tpu.quant.qtensor import DenseLinear, from_dense
from exllamav2_tpu.stloader import write_safetensors, STFile
from exllamav2_tpu.cache import KVCache

__all__ = ["convert_model", "calibration_rows"]


def calibration_rows(tokenizer, num_rows: int = 16, row_len: int = 256,
                     text: str | None = None, seed: int = 0,
                     noise_rows: int = 1) -> np.ndarray:
    """Tokenized calibration rows (conversion/tokenize.py analog).

    `text` may be a string, a path to a .txt file, or a path to a .parquet
    file with a text column (the reference's standard calibration format).
    With nothing given, uses the bundled standard mix — original prose /
    code / multilingual / numeric text spanning the same domains as the
    reference's curated set (conversion/tokenize.py standard_cal_data;
    no network access here, so the corpus is bundled, not downloaded).
    `noise_rows` appends rows of uniform-random token ids so quantization
    stays calibrated for token statistics outside the text sample (the
    reference's calibration noise rows, embedding.py:191-221).
    """
    if isinstance(text, str) and os.path.exists(text):
        if text.endswith(".parquet"):
            text = _read_parquet_text(text)
        else:
            with open(text) as f:
                text = f.read()
    if text is None:
        from exllamav2_tpu.convert.standard_cal import STANDARD_CAL_TEXT
        text = STANDARD_CAL_TEXT
    ids = tokenizer.encode(text)
    noise_rows = min(noise_rows, max(num_rows - 1, 0))
    text_rows = num_rows - noise_rows
    need = text_rows * row_len
    while len(ids) < need:
        ids = np.concatenate([ids, ids])
    rows = ids[:need].reshape(text_rows, row_len).astype(np.int32)
    if noise_rows:
        nrng = np.random.default_rng(seed + 0x5EED)
        noise = nrng.integers(0, tokenizer.vocab_size,
                              (noise_rows, row_len)).astype(np.int32)
        rows = np.concatenate([rows, noise], axis=0)
    return rows


def _read_parquet_text(path: str) -> str:
    """Concatenate the text column of a parquet file (tokenize.py:60-87)."""
    try:
        import pyarrow.parquet as pq
        table = pq.read_table(path)
    except ImportError:
        try:
            import pandas as pd
            df = pd.read_parquet(path)
            for col in df.columns:
                if df[col].dtype == object:
                    return "\n\n".join(str(v) for v in df[col])
            raise ValueError(f"no text column in {path}")
        except ImportError as e:
            raise RuntimeError(
                "parquet calibration needs pyarrow or pandas") from e
    for name in table.column_names:
        col = table.column(name)
        if str(col.type) in ("string", "large_string"):
            return "\n\n".join(str(v) for v in col.to_pylist())
    raise ValueError(f"no text column in {path}")


# ---------------------------------------------------------------------------
# calibration forward with captured linear inputs
# ---------------------------------------------------------------------------

def _causal_attn(q, k, v, scale):
    """Full causal attention (no cache) for calibration, [R, T, H, D]."""
    b, t, hq, hd = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    qg = q.reshape(b, t, hkv, g, hd)
    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.tril(jnp.ones((t, t), bool))
    scores = jnp.where(mask[None, None, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum("bkgts,bskd->btkgd", p, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, t, hq * hd)


def _layer_forward_capture(lw, st, x, sin, cos, want_caps=True):
    """One decoder layer on [R, T, d]; returns (out, captures dict).

    captures: attn_in (input to q/k/v), o_in, mlp_in (input to gate/up or
    expert w1/w3), down_in / down_in_{e} — the Hessian sources
    (measure.py:577-605). Handles post-norms, parallel blocks, MoE and
    ungated MLPs like models/forward.py.
    """
    b, t, d = x.shape
    cap = {}
    hidden = norm_apply(x, lw.attn.norm, st)
    if want_caps:
        cap["attn_in"] = hidden
    q, k, v = _attn_qkv(x, lw.attn, st, sin, cos)
    scale = st.attn_scale if st.attn_scale is not None else \
        st.head_dim ** -0.5
    att = _causal_attn(q, k, v, scale).astype(jnp.bfloat16)
    if want_caps:
        cap["o_in"] = att
    o = linear_apply(att.reshape(b * t, -1), lw.attn.o,
                     fused=False).reshape(b, t, -1)
    if lw.attn.norm_post is not None:
        o = norm_apply(o, lw.attn.norm_post, st)

    mlp = lw.mlp
    if st.parallel_blocks:
        mlp_x = x
    else:
        x = x + o * st.scale_depth
        mlp_x = x
    hidden2 = norm_apply(mlp_x, mlp.norm, st)
    if want_caps:
        cap["mlp_in"] = hidden2
    h2 = hidden2.reshape(b * t, d)

    if isinstance(mlp, MoEWeights):
        router_logits = linear_apply(h2, mlp.router, fused=False)
        probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
        topw, topi = jax.lax.top_k(probs, st.num_experts_per_tok)
        if st.norm_topk_prob:
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
        mix = jnp.zeros_like(probs).at[
            jnp.arange(probs.shape[0])[:, None], topi].set(topw)
        out = None
        hb = h2.astype(jnp.bfloat16)
        for e in range(st.num_experts):
            gate = linear_apply(hb, mlp.w1[e], fused=False)
            up = linear_apply(hb, mlp.w3[e], fused=False)
            inter = (_act(gate, st.mlp_act) * up).astype(jnp.bfloat16)
            if want_caps:
                cap[f"down_in_{e}"] = inter
            y = linear_apply(inter, mlp.w2[e], fused=False)
            y = y * mix[:, e:e + 1]
            out = y if out is None else out + y
        m_out = out.reshape(b, t, -1)
    else:
        up = linear_apply(h2, mlp.up, fused=False)
        if st.mlp_gated and mlp.gate is not None:
            gate = linear_apply(h2, mlp.gate, fused=False)
            inter = (_act(gate, st.mlp_act) * up).astype(jnp.bfloat16)
        else:
            inter = _act(up, st.mlp_act).astype(jnp.bfloat16)
        if want_caps:
            cap["down_in"] = inter
        m_out = linear_apply(inter, mlp.down, fused=False).reshape(b, t, -1)
    if getattr(mlp, "norm_post", None) is not None:
        m_out = norm_apply(m_out, mlp.norm_post, st)

    if st.parallel_blocks:
        x = x + o + m_out
    else:
        x = x + m_out * st.scale_depth
    return x, cap


def _sublayer_out_err(x_in, w_orig, dq, sub_rows=4096):
    """Relative output error of a quantized linear on captured inputs."""
    xi = jnp.asarray(x_in, jnp.float32).reshape(-1, w_orig.shape[0])
    xi = xi[:sub_rows]
    y0 = xi @ w_orig
    y1 = xi @ jnp.asarray(dq)
    num = jnp.sum((y1 - y0) ** 2)
    den = jnp.sum(y0 ** 2) + 1e-12
    return float(num / den)


# ---------------------------------------------------------------------------
# optimizer: simulated annealing + greedy top-up (optimize.py analog)
# ---------------------------------------------------------------------------

def optimize_allocation(slots: list[list[tuple[int, float]]],
                        budget_bits: int, seed: int = 0,
                        iters: int = 20000) -> list[int]:
    """slots[i] = [(cost_bits, err), ...] -> chosen option index per slot.

    Minimizes sum(err) under the budget (ext_c.sim_anneal +
    optimize.py:129-158 greedy top-up). The returned index refers to the
    CALLER's original option order (the internal cost sort is mapped back
    through its permutation, so shape-dependent cost crossovers between
    the caller's ordering and the per-slot true costs cannot silently
    select a different option than the one chosen).
    """
    rng = np.random.default_rng(seed)
    n = len(slots)
    choice = [0] * n                       # cheapest first (options sorted)
    order = []                             # sorted position -> original idx
    for i, opts in enumerate(slots):
        srt = sorted(range(len(opts)), key=lambda j: opts[j][0])
        order.append(srt)
        slots[i] = [opts[j] for j in srt]
    def unsorted(ch):
        return [order[i][ch[i]] for i in range(n)]

    cost = sum(slots[i][choice[i]][0] for i in range(n))
    err = sum(slots[i][choice[i]][1] for i in range(n))
    if cost > budget_bits:
        return unsorted(choice)            # budget below minimum: floor

    # native C++ annealer when available (ext_quant.cpp sim_anneal analog)
    from exllamav2_tpu.native import sim_anneal as native_sim_anneal
    native = native_sim_anneal(slots, budget_bits, iters, seed)
    if native is not None:
        return unsorted(native)

    temp = max(e for sl in slots for _, e in sl) + 1e-9
    for it in range(iters):
        temp *= 0.9997
        i = rng.integers(n)
        j = rng.integers(len(slots[i]))
        dc = slots[i][j][0] - slots[i][choice[i]][0]
        de = slots[i][j][1] - slots[i][choice[i]][1]
        if cost + dc > budget_bits:
            continue
        if de <= 0 or rng.random() < np.exp(-de / max(temp, 1e-12)):
            choice[i] = j
            cost += dc
            err += de
    # greedy top-up: spend leftover budget on the best err/bit upgrades
    improved = True
    while improved:
        improved = False
        best = None
        for i in range(n):
            for j in range(len(slots[i])):
                dc = slots[i][j][0] - slots[i][choice[i]][0]
                de = slots[i][j][1] - slots[i][choice[i]][1]
                if dc > 0 and de < 0 and cost + dc <= budget_bits:
                    r = -de / dc
                    if best is None or r > best[0]:
                        best = (r, i, j, dc)
        if best is not None:
            _, i, j, dc = best
            choice[i] = j
            cost += dc
            improved = True
    return unsorted(choice)


# ---------------------------------------------------------------------------
# architecture-derived module lists (measure.py:577-605 analog)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Sub:
    name: str              # canonical output key, e.g. "...self_attn.q_proj"
    cap: str               # capture key feeding it
    kind: str              # "attn" | "mlp" (allocation slot group)
    lin: object            # DenseLinear
    field: str             # attribute path for weight replacement


def _layer_subs(cfg: ModelConfig, lw, l: int) -> list[_Sub]:
    """Quantizable sub-linears of one layer, from the architecture.

    Fused qkv / gate_up checkpoints were already sliced at load; the
    output always stores unfused canonical keys (the reference does the
    same — each submodule packs its own EXL2 tensor set).
    """
    arch = cfg.arch
    p = arch.lm_prefix + f"model.layers.{l}"
    subs = [
        _Sub(f"{p}.self_attn.q_proj", "attn_in", "attn", lw.attn.q, "attn.q"),
        _Sub(f"{p}.self_attn.k_proj", "attn_in", "attn", lw.attn.k, "attn.k"),
        _Sub(f"{p}.self_attn.v_proj", "attn_in", "attn", lw.attn.v, "attn.v"),
        _Sub(f"{p}.self_attn.o_proj", "o_in", "attn", lw.attn.o, "attn.o"),
    ]
    if isinstance(lw.mlp, MoEWeights):
        for e in range(cfg.num_experts):
            subs += [
                _Sub(arch.lm_prefix + arch.key_moe_w1.format(l=l, e=e),
                     "mlp_in", "mlp", lw.mlp.w1[e], f"mlp.w1.{e}"),
                _Sub(arch.lm_prefix + arch.key_moe_w3.format(l=l, e=e),
                     "mlp_in", "mlp", lw.mlp.w3[e], f"mlp.w3.{e}"),
                _Sub(arch.lm_prefix + arch.key_moe_w2.format(l=l, e=e),
                     f"down_in_{e}", "mlp", lw.mlp.w2[e], f"mlp.w2.{e}"),
            ]
    else:
        if lw.mlp.gate is not None:
            gate_key = (arch.key_mlp_gate or "model.layers.{l}.mlp.gate_proj"
                        ).split("|")[0].format(l=l)
            subs.append(_Sub(arch.lm_prefix + gate_key, "mlp_in", "mlp",
                             lw.mlp.gate, "mlp.gate"))
        up_key = arch.key_mlp_up.split("|")[0].format(l=l)
        down_key = arch.key_mlp_down.split("|")[0].format(l=l)
        if arch.fused_gate_up:
            up_key = f"model.layers.{l}.mlp.up_proj"
            if lw.mlp.gate is not None:
                subs[-1].name = arch.lm_prefix + \
                    f"model.layers.{l}.mlp.gate_proj"
        subs.append(_Sub(arch.lm_prefix + up_key, "mlp_in", "mlp",
                         lw.mlp.up, "mlp.up"))
        subs.append(_Sub(arch.lm_prefix + down_key, "down_in", "mlp",
                         lw.mlp.down, "mlp.down"))
    return subs


def _replace_lin(lw, field: str, new):
    """Return a copy of LayerWeights with one sub-linear replaced."""
    import dataclasses as dc
    parts = field.split(".")
    if parts[0] == "attn":
        return dc.replace(lw, attn=dc.replace(lw.attn, **{parts[1]: new}))
    mlp = lw.mlp
    if len(parts) == 3:                    # moe expert tuple
        tup = list(getattr(mlp, parts[1]))
        tup[int(parts[2])] = new
        return dc.replace(lw, mlp=dc.replace(mlp, **{parts[1]: tuple(tup)}))
    return dc.replace(lw, mlp=dc.replace(mlp, **{parts[1]: new}))


# ---------------------------------------------------------------------------
# per-module GPTQ quantize + pack
# ---------------------------------------------------------------------------

def _quantize_sub(sub: _Sub, qp: QParams, cap: dict,
                  shared: dict) -> tuple[dict, np.ndarray]:
    """GPTQ-quantize one sub-linear; returns (tensor dict, recon [K, N])."""
    w_t = np.asarray(sub.lin.weight, np.float32)
    k, n = w_t.shape
    g = AdaptiveGPTQ(w_t)
    if sub.cap in shared:
        g.reuse_h(shared[sub.cap])
    else:
        g.add_batch(np.asarray(cap[sub.cap], np.float32))
        g.prepare()
        shared[sub.cap] = g
    res = g.quantize(qp.groups(k))
    t = F.exl2_pack_quantized(
        res["q"], np.asarray(res["qscale"], np.uint16),
        res["qscale_max"].astype(np.float16) / np.float16(1.0),
        res["bits"], qp.group_size, res["invperm"])
    # sanity: packed tensors must reconstruct dq within 0.05
    # (conversion/quantize.py:96-124 gate)
    recon = F.exl2_dequantize(t, original_order=True)
    dq_orig = res["dq"][res["invperm"]]
    diff = np.abs(recon - dq_orig).max()
    assert diff < 0.05, \
        f"reconstruction check failed on {sub.name}: {diff}"
    tensors = {
        f"{sub.name}.q_weight": t.q_weight,
        f"{sub.name}.q_scale": t.q_scale,
        f"{sub.name}.q_scale_max": t.q_scale_max.astype(np.float16),
        f"{sub.name}.q_groups": t.q_groups,
        f"{sub.name}.q_invperm": t.q_invperm,
    }
    # biases ride along unquantized (fused-qkv sources carry them under
    # the fused key, which the compile stage drops entirely)
    if getattr(sub.lin, "bias", None) is not None:
        tensors[f"{sub.name}.bias"] = np.asarray(
            sub.lin.bias, np.float32).astype(np.float16)
    return tensors, recon


def _load_layer_recons(path: str, subs: list[_Sub]) -> dict[str, np.ndarray]:
    """Rebuild recon weights from a finished layer file (resume path)."""
    st = STFile(path)
    out = {}
    for sub in subs:
        t = F.Exl2Tensor(
            k=0, n=0,
            q_weight=st.get_tensor(f"{sub.name}.q_weight"),
            q_scale=st.get_tensor(f"{sub.name}.q_scale"),
            q_scale_max=st.get_tensor(
                f"{sub.name}.q_scale_max").astype(np.float16),
            q_groups=st.get_tensor(f"{sub.name}.q_groups"),
            q_invperm=st.get_tensor(f"{sub.name}.q_invperm"))
        t.n = t.q_weight.shape[1]
        t.k = t.q_invperm.shape[0]
        out[sub.name] = F.exl2_dequantize(t, original_order=True)
    return out


# ---------------------------------------------------------------------------
# main driver
# ---------------------------------------------------------------------------

def convert_model(model_dir: str, out_dir: str, *, bits: float = 4.0,
                  head_bits: int = 6, cal_rows: int = 8,
                  cal_len: int = 256, cal_text: str | None = None,
                  seed: int = 0, progress=print,
                  shard_size_mb: float = 8192,
                  status_output: bool = False,
                  group_size: int = 32) -> str:
    """Convert an FP16/BF16 checkpoint to EXL2 at `bits` average bpw.

    head_bits: 2..8 quantizes lm_head at that width (reference
    quant_lm_head, quantize.py:443-543); 16/None keeps it fp16.
    shard_size_mb: outputs larger than this split into numbered
    safetensors shards with a weight-map index (reference
    compile.py:176+ output_shard_size; 0 disables splitting).
    status_output: emit machine-parseable [STATUS]{...}[/STATUS] stage
    lines (reference conversion/bot_status.py protocol; stage names
    match measure.py:453 / quantize.py / compile.py:178).
    group_size: scale-group rows for every candidate option (default 32,
    the reference's EXL2 grid). 128 emits W4A8-friendly checkpoints —
    the int8-MXU decode mode (enable_w4a8 / DynamicGenerator(w4a8=True))
    only pays at gs>=128 (docs/DESIGN.md round-5 study).
    """
    from exllamav2_tpu.convert.bot_status import print_stage
    os.makedirs(out_dir, exist_ok=True)
    quant_dir = os.path.join(out_dir, "quant")
    os.makedirs(quant_dir, exist_ok=True)
    job_path = os.path.join(out_dir, "job.json")
    meas_path = os.path.join(out_dir, "measurement.json")
    job = {"stage": "measure", "group_size": group_size}
    if os.path.exists(job_path):
        with open(job_path) as f:
            job = json.load(f)
        # group_size invalidates EVERYTHING persisted: measurement.json
        # option errors/bit totals are priced on the old grid, strategy
        # indices would silently apply to the new one, and already
        # quantized layer files keep the old groups — a mixed-group
        # checkpoint. Refuse loudly rather than resume across it.
        prev_gs = job.get("group_size", 32)
        if prev_gs != group_size:
            raise ValueError(
                f"resume state in {out_dir} was produced with "
                f"group_size={prev_gs}, requested {group_size}; delete "
                f"the output directory (or pass a fresh one) to convert "
                f"at the new group size")

    def save_job():
        with open(job_path, "w") as f:
            json.dump(job, f)

    cfg = ModelConfig.from_dir(model_dir)
    assert cfg.quant_method is None, "source must be an unquantized model"
    weights, st = load_model(cfg)
    from exllamav2_tpu.tokenizer import load_tokenizer
    tokenizer = load_tokenizer(model_dir)

    rows = calibration_rows(tokenizer, cal_rows, cal_len, cal_text, seed)
    rows = np.clip(rows, 0, cfg.vocab_size - 1)

    # embeddings (conversion/measure.py:71-92)
    def embed_states():
        x = jnp.take(weights.embed, jnp.asarray(rows), axis=0)
        x = x.astype(jnp.float32)
        if st.normalize_embeddings:
            x = x * (st.hidden_size ** 0.5)
        if st.embedding_multiplier != 1.0:
            x = x * st.embedding_multiplier
        return x.astype(jnp.bfloat16)

    pos = jnp.arange(rows.shape[1], dtype=jnp.int32)
    sin = jnp.take(weights.sin, pos, axis=0)
    cos = jnp.take(weights.cos, pos, axis=0)

    attn_opts, mlp_opts = (qparams_attn(group_size),
                           qparams_mlp(group_size))
    head_qp = qparams_head_for(head_bits)
    quantize_head = (head_qp is not None and not cfg.tie_word_embeddings
                     and isinstance(weights.head, DenseLinear)
                     and cfg.tensor_file_map.has_prefix(
                         cfg.arch.lm_prefix + cfg.arch.key_head + "."))

    # ---- stage: measure (RTN candidate errors, persisted per layer) ----
    meas = {"layers": {}}
    if os.path.exists(meas_path):
        with open(meas_path) as f:
            meas = json.load(f)
    def _mid_qp(opts):
        # representative option: nearest the global bpw target
        return min(opts, key=lambda qp: abs(qp.bpw(4096, 4096) - bits))

    if job["stage"] == "measure":
        hs = embed_states()
        for l, lw in enumerate(weights.layers):
            # prep per-sub Hessians from states that have passed through
            # PROGRESSIVELY-QUANTIZED earlier layers (reference measure.py
            # forwards quantized module outputs so each layer is measured
            # against the error it will actually see)
            _, cap = _layer_forward_capture(lw, st, hs, sin, cos)
            cap = {k: np.asarray(v, np.float16) for k, v in cap.items()}
            prepped = {"attn": [], "mlp": []}
            for sub in _layer_subs(cfg, lw, l):
                w_t = np.asarray(sub.lin.weight, np.float32)
                g = AdaptiveGPTQ(w_t)
                g.add_batch(cap[sub.cap].astype(np.float32))
                diag = np.asarray(jnp.diagonal(g.hessian))
                perm = np.argsort(-diag)
                g.w = g.w[perm]
                prepped[sub.kind].append((sub, g, np.argsort(perm), w_t))
            if str(l) not in meas["layers"]:
                entry = {}
                for kind, opts in (("attn", attn_opts), ("mlp", mlp_opts)):
                    opt_list = []
                    if prepped[kind]:
                        for qp in opts:
                            tot_bits = 0
                            err = 0.0
                            for sub, g, inv, w_t in prepped[kind]:
                                k, n = w_t.shape
                                dq = g.quantize_rtn(qp.groups(k))[inv]
                                err += _sublayer_out_err(
                                    cap[sub.cap], w_t, dq)
                                tot_bits += qp.total_bits(k, n)
                            opt_list.append((tot_bits, err))
                    entry[kind] = opt_list
                meas["layers"][str(l)] = entry
                with open(meas_path, "w") as f:
                    json.dump(meas, f)
                progress(f" -- measured layer {l + 1}/{st.num_layers}")
                print_stage(status_output, "Measuring", l + 1,
                            st.num_layers)
            # advance states through an RTN reconstruction at the
            # representative option (deterministic, so resume re-derives
            # identical states)
            lw_mid = lw
            for kind, opts in (("attn", attn_opts), ("mlp", mlp_opts)):
                qp = _mid_qp(opts)
                for sub, g, inv, w_t in prepped[kind]:
                    dq = g.quantize_rtn(qp.groups(w_t.shape[0]))[inv]
                    lw_mid = _replace_lin(lw_mid, sub.field,
                                          from_dense(dq, _bias_of(sub.lin)))
            hs, _ = _layer_forward_capture(lw_mid, st, hs, sin, cos,
                                           want_caps=False)
        job["stage"] = "optimize"
        save_job()

    # ---- stage: optimize (global allocation) ----
    if job["stage"] == "optimize":
        slots, slot_meta = [], []
        for l in range(st.num_layers):
            entry = meas["layers"][str(l)]
            for kind in ("attn", "mlp"):
                if entry[kind]:
                    slots.append([tuple(o) for o in entry[kind]])
                    slot_meta.append((l, kind))
        total_weights = sum(
            int(np.prod(sub.lin.weight.shape))
            for l, lw in enumerate(weights.layers)
            for sub in _layer_subs(cfg, lw, l))
        budget = int(bits * total_weights)
        choice = optimize_allocation([list(s) for s in slots], budget, seed)
        strategy = {}
        for (l, kind), ci in zip(slot_meta, choice):
            # choice indices refer to the measurement opt_list order,
            # which is exactly the attn_opts/mlp_opts order
            strategy[f"{l}.{kind}"] = ci
        job["strategy"] = strategy
        job["stage"] = "quantize"
        save_job()
        progress(" -- optimized bit allocation")
        print_stage(status_output, "Optimizing", 1, 1)

    strategy = {k: int(v) for k, v in job.get("strategy", {}).items()}

    def qp_for(l, kind):
        opts = attn_opts if kind == "attn" else mlp_opts
        return opts[strategy[f"{l}.{kind}"]]

    # ---- stage: quantize (GPTQ + per-layer output files) ----
    if job["stage"] == "quantize":
        hs = embed_states()
        for l, lw in enumerate(weights.layers):
            subs = _layer_subs(cfg, lw, l)
            layer_path = os.path.join(quant_dir, f"layer_{l}.safetensors")
            if os.path.exists(layer_path):
                recons = _load_layer_recons(layer_path, subs)
                lw2 = lw
                for sub in subs:
                    lw2 = _replace_lin(lw2, sub.field,
                                       from_dense(recons[sub.name],
                                                  _bias_of(sub.lin)))
                weights.layers = _set_layer(weights.layers, l, lw2)
                hs, _ = _layer_forward_capture(lw2, st, hs, sin, cos,
                                               want_caps=False)
                continue
            _, cap = _layer_forward_capture(lw, st, hs, sin, cos)
            cap = {k: np.asarray(v, np.float16) for k, v in cap.items()}
            shared: dict[str, AdaptiveGPTQ] = {}
            tensors = {}
            lw2 = lw
            for sub in subs:
                qp = qp_for(l, sub.kind)
                t, recon = _quantize_sub(sub, qp, cap, shared)
                tensors.update(t)
                # replace with reconstruction so later layers see the error
                # (conversion/quantize.py:132)
                lw2 = _replace_lin(lw2, sub.field,
                                   from_dense(recon, _bias_of(sub.lin)))
            write_safetensors(layer_path, tensors)
            weights.layers = _set_layer(weights.layers, l, lw2)
            hs, _ = _layer_forward_capture(lw2, st, hs, sin, cos,
                                           want_caps=False)
            progress(f" -- quantized layer {l + 1}/{st.num_layers}")
            print_stage(status_output, "Quantizing", l + 1,
                        st.num_layers)

        # lm_head at head_bits (quantize.py:443-543)
        if quantize_head:
            head_path = os.path.join(quant_dir, "head.safetensors")
            if not os.path.exists(head_path):
                hnorm = norm_apply(hs, weights.final_norm, st)
                head_key = cfg.arch.lm_prefix + cfg.arch.key_head
                sub = _Sub(head_key, "head_in", "head", weights.head, "head")
                cap = {"head_in": np.asarray(hnorm, np.float16)}
                t, _recon = _quantize_sub(sub, head_qp, cap, {})
                write_safetensors(head_path, t)
                progress(f" -- quantized lm_head ({head_qp.desc})")
                print_stage(status_output, "Quantizing (head)", 1, 1)
        job["stage"] = "compile"
        save_job()

    # ---- stage: compile (compile.py analog) ----
    quantized_prefixes = set()
    drop_prefixes = set()
    for l, lw in enumerate(weights.layers):
        for sub in _layer_subs(cfg, lw, l):
            quantized_prefixes.add(sub.name)
        # fused source tensors were sliced + quantized under unfused
        # names (bias included); drop the originals entirely
        if cfg.arch.fused_qkv and cfg.arch.key_fused_qkv:
            drop_prefixes.add(
                cfg.arch.lm_prefix + cfg.arch.key_fused_qkv.format(l=l))
        if cfg.arch.fused_gate_up and cfg.arch.key_fused_gate_up:
            drop_prefixes.add(
                cfg.arch.lm_prefix
                + cfg.arch.key_fused_gate_up.format(l=l))
    if quantize_head:
        quantized_prefixes.add(cfg.arch.lm_prefix + cfg.arch.key_head)

    out_tensors: dict[str, np.ndarray] = {}
    dtypes: dict[str, str] = {}
    tfm = cfg.tensor_file_map
    for key in tfm.keys():
        prefix = key.rsplit(".", 1)[0]
        if prefix in drop_prefixes:
            continue                       # fused source, fully replaced
        if prefix in quantized_prefixes:
            continue                       # replaced by packed tensors
        out_tensors[key] = tfm.get_tensor(key).copy()
        if tfm.get_dtype(key) == "BF16":
            dtypes[key] = "BF16"
    for fn in sorted(os.listdir(quant_dir)):
        stf = STFile(os.path.join(quant_dir, fn))
        for key in stf.keys():
            out_tensors[key] = stf.get_tensor(key).copy()
        stf.close()

    _write_model_files(out_dir, out_tensors, dtypes, shard_size_mb)
    for fn in os.listdir(model_dir):
        if fn.endswith(".json") or fn.startswith("tokenizer"):
            shutil.copy(os.path.join(model_dir, fn),
                        os.path.join(out_dir, fn))
    # stamp quantization metadata (reference compile.py writes config keys)
    cfg_path = os.path.join(out_dir, "config.json")
    with open(cfg_path) as f:
        out_cfg = json.load(f)
    out_cfg["quantization_config"] = {
        "quant_method": "exl2", "bits": bits,
        "head_bits": head_bits if quantize_head else 16,
        "calibration": {"rows": cal_rows, "length": cal_len}}
    with open(cfg_path, "w") as f:
        json.dump(out_cfg, f, indent=1)
    job["stage"] = "done"
    save_job()
    progress(f" -- compiled -> {out_dir}")
    print_stage(status_output, "Compiling", 1, 1)
    return out_dir


def _write_model_files(out_dir: str, tensors: dict, dtypes: dict,
                       shard_size_mb: float) -> None:
    """Write model.safetensors, size-splitting into numbered shards with
    a weight-map index when over shard_size_mb (reference
    compile.py:176+; huggingface sharded-checkpoint convention —
    TensorFileMap prefers the index at load)."""
    limit = int(shard_size_mb * 1024 * 1024) if shard_size_mb else 0
    total = sum(t.nbytes for t in tensors.values())
    if not limit or total <= limit:
        write_safetensors(os.path.join(out_dir, "model.safetensors"),
                          tensors, dtypes=dtypes)
        return
    shards: list[dict] = [{}]
    sizes = [0]
    for name, t in tensors.items():
        if sizes[-1] + t.nbytes > limit and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = t
        sizes[-1] += t.nbytes
    n = len(shards)
    index = {"metadata": {"total_size": total}, "weight_map": {}}
    for i, shard in enumerate(shards):
        fn = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        write_safetensors(os.path.join(out_dir, fn), shard,
                          dtypes={k: v for k, v in dtypes.items()
                                  if k in shard})
        for name in shard:
            index["weight_map"][name] = fn
    with open(os.path.join(out_dir, "model.safetensors.index.json"),
              "w") as f:
        json.dump(index, f, indent=2)


def _bias_of(lin):
    b = getattr(lin, "bias", None)
    return None if b is None else np.asarray(b, np.float32)


def _set_layer(layers: tuple, l: int, lw2) -> tuple:
    out = list(layers)
    out[l] = lw2
    return tuple(out)
