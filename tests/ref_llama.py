"""Pure-numpy float32 Llama reference for golden model tests."""

from __future__ import annotations

import numpy as np

from exllamav2_tpu.quant import formats as F
from exllamav2_tpu.stloader import TensorFileMap, read_weight_f32


def _get_w(tfm: TensorFileMap, key: str) -> np.ndarray:
    """-> [in, out] f32 weight for x @ w."""
    if key + ".q_weight" in tfm:
        t = F.Exl2Tensor(
            k=0, n=tfm.get_shape(key + ".q_weight")[1],
            q_weight=tfm.get_tensor(key + ".q_weight"),
            q_scale=tfm.get_tensor(key + ".q_scale"),
            q_scale_max=tfm.get_tensor(key + ".q_scale_max").astype(np.float16),
            q_groups=tfm.get_tensor(key + ".q_groups"),
            q_invperm=tfm.get_tensor(key + ".q_invperm")
            if key + ".q_invperm" in tfm else None)
        gr = t.q_groups.astype(np.int64)
        rows = 0
        for i in range(len(gr) // 2):
            if i < len(gr) // 2 - 1:
                rows += (int(gr[i*2+3]) - int(gr[i*2+1])) * 32 // int(gr[i*2])
        if t.q_invperm is not None:
            t.k = t.q_invperm.shape[0]
        else:
            # last group: assume it fills to a group boundary
            t.k = rows + 32  # tiny fixture always has uniform 32-row groups
        return F.exl2_dequantize(t)
    if key + ".qweight" in tfm:
        qweight = tfm.get_tensor(key + ".qweight")
        qzeros = tfm.get_tensor(key + ".qzeros")
        scales = tfm.get_tensor(key + ".scales").astype(np.float16)
        n = qweight.shape[1]
        bits = qzeros.shape[1] * 32 // n
        t = F.GptqTensor(
            k=qweight.shape[0] * 32 // bits, n=n, bits=bits,
            qweight=qweight, qzeros=qzeros, scales=scales,
            g_idx=tfm.get_tensor(key + ".g_idx")
            if key + ".g_idx" in tfm else None)
        return F.gptq_dequantize(t)
    return read_weight_f32(tfm, key + ".weight").T


def rms_norm(x, w, eps=1e-5):
    v = np.mean(x * x, axis=-1, keepdims=True)
    return x / np.sqrt(v + eps) * w


def rope_rotate(x, pos, head_dim, theta=10000.0):
    """NEOX-style rotate-half. x [B, T, H, D], pos [T]."""
    inv = 1.0 / theta ** (np.arange(0, head_dim, 2) / head_dim)
    fr = np.outer(pos, inv)                                  # [T, D/2]
    sin, cos = np.sin(fr), np.cos(fr)
    x1, x2 = x[..., :head_dim // 2], x[..., head_dim // 2:]
    s = sin[None, :, None, :]
    c = cos[None, :, None, :]
    return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def llama_forward(model_dir: str, ids: np.ndarray) -> np.ndarray:
    """ids [B, T] -> logits [B, T, vocab] f32, full attention, no cache."""
    import json, os
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    tfm = TensorFileMap(model_dir)
    h = cfg["hidden_size"]
    nh = cfg["num_attention_heads"]
    nkv = cfg.get("num_key_value_heads", nh)
    hd = h // nh
    eps = cfg.get("rms_norm_eps", 1e-5)
    theta = cfg.get("rope_theta", 10000.0)

    b, t = ids.shape
    emb = read_weight_f32(tfm, "model.embed_tokens.weight")
    x = emb[ids]                                             # [B, T, h]
    pos = np.arange(t)

    for l in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{l}"
        hidden = rms_norm(x, read_weight_f32(tfm, f"{p}.input_layernorm.weight"), eps)
        q = hidden @ _get_w(tfm, f"{p}.self_attn.q_proj")
        k = hidden @ _get_w(tfm, f"{p}.self_attn.k_proj")
        v = hidden @ _get_w(tfm, f"{p}.self_attn.v_proj")
        q = rope_rotate(q.reshape(b, t, nh, hd), pos, hd, theta)
        k = rope_rotate(k.reshape(b, t, nkv, hd), pos, hd, theta)
        v = v.reshape(b, t, nkv, hd)
        g = nh // nkv
        qg = q.reshape(b, t, nkv, g, hd)
        scores = np.einsum("btkgd,bskd->bkgts", qg, k) / np.sqrt(hd)
        mask = np.tril(np.ones((t, t), bool))
        scores = np.where(mask[None, None, None], scores, -1e30)
        ex = np.exp(scores - scores.max(-1, keepdims=True))
        probs = ex / ex.sum(-1, keepdims=True)
        att = np.einsum("bkgts,bskd->btkgd", probs, v).reshape(b, t, nh * hd)
        x = x + att @ _get_w(tfm, f"{p}.self_attn.o_proj")
        hidden = rms_norm(x, read_weight_f32(tfm, f"{p}.post_attention_layernorm.weight"), eps)
        gate = hidden @ _get_w(tfm, f"{p}.mlp.gate_proj")
        up = hidden @ _get_w(tfm, f"{p}.mlp.up_proj")
        silu = gate / (1 + np.exp(-gate))
        x = x + (silu * up) @ _get_w(tfm, f"{p}.mlp.down_proj")

    x = rms_norm(x, read_weight_f32(tfm, "model.norm.weight"), eps)
    return x @ _get_w(tfm, "lm_head")
