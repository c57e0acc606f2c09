"""Vision tower: patch embed -> transformer -> multimodal projector.

TPU-native analog of the reference's vlm/vision_tower.py (493 LoC torch)
+ vlm/mmprojector.py. Design differences from the reference:

  * the patch "conv" is stride == kernel, so it is expressed as a patch
    reshape + one MXU matmul instead of a convolution (XLA-friendly, no
    conv lowering needed);
  * the whole tower runs as one jitted function over static (grid) shapes;
    non-causal attention with an optional block-diagonal window mask
    (qwen2.5) is plain masked softmax — no cache, no paging;
  * 2-D (pixtral) / grid (qwen2) rotary tables are built on host per
    image size and passed in like any other rope rows.

Towers stay unquantized (the reference's converter copies vt/mmp tensors
verbatim, compile.py:70-172) — weights are bf16 DenseLinears.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from exllamav2_tpu.config import ModelConfig
from exllamav2_tpu.models.modules import NormWeights
from exllamav2_tpu.models.loader import load_linear, load_norm
from exllamav2_tpu.stloader import read_weight_f32
from exllamav2_tpu.vlm.mm_embedding import MMEmbedding
from exllamav2_tpu.vlm import processing

__all__ = ["VisionTower"]


@partial(jax.tree_util.register_dataclass,
         data_fields=["norm1", "q", "k", "v", "o", "norm2", "gate", "up",
                      "down"],
         meta_fields=[])
@dataclasses.dataclass
class _VLayer:
    norm1: NormWeights
    q: object
    k: object
    v: object
    o: object
    norm2: NormWeights
    gate: object | None
    up: object
    down: object


def _vnorm(x, w: NormWeights, kind: str, eps: float):
    xf = x.astype(jnp.float32)
    if kind == "rms":
        y = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * w.weight.astype(jnp.float32)
    if w.bias is not None:
        y = y + w.bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _vact(x, kind: str):
    if kind in ("silu",):
        return jax.nn.silu(x)
    if kind in ("gelu", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=True)
    if kind == "quickgelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(kind)


def _dense(x, lin):
    y = jnp.dot(x.astype(jnp.bfloat16), lin.weight,
                preferred_element_type=jnp.float32)
    if lin.bias is not None:
        y = y + lin.bias.astype(jnp.float32)
    return y


def _rope2d(x, sin, cos):
    """Apply rotary with full-dim tables [S, D] (pixtral/qwen2 towers
    use the cat(freqs, freqs) layout; NEOX halves rotation)."""
    if sin is None:
        return x
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1 = xf[..., : d // 2]
    x2 = xf[..., d // 2:]
    s1 = sin[:, None, : d // 2]
    c1 = cos[:, None, : d // 2]
    out = jnp.concatenate([x1 * c1 - x2 * s1, x2 * c1 + x1 * s1], axis=-1)
    return out.astype(x.dtype)


class VisionTower:
    """Loads and runs the vision stack of a multimodal checkpoint."""

    def __init__(self, cfg: ModelConfig):
        assert cfg.vision_model_type, "config has no vision tower"
        self.cfg = cfg
        tfm = cfg.tensor_file_map
        arch = cfg.arch
        vt = cfg.vision_model_type
        self.vt = vt
        pre = arch.vt_prefix
        self.norm_kind = "layernorm" if vt in (
            "qwen2", "siglip_vision_model") else "rms"
        self.eps = 1e-6

        if vt == "pixtral":
            keys = dict(layers="transformer.layers",
                        attn=".attention", q=".q_proj", k=".k_proj",
                        v=".v_proj", o=".o_proj",
                        norm1=".attention_norm", norm2=".ffn_norm",
                        gate=".feed_forward.gate_proj",
                        up=".feed_forward.up_proj",
                        down=".feed_forward.down_proj")
            self.ln_pre = load_norm(tfm, pre + "ln_pre")
            self.patch_conv = self._load_patch_conv(pre + "patch_conv")
            self.pos_emb = None
        elif vt in ("qwen2", "qwen2.5"):
            keys = dict(layers="blocks", attn=".attn", fused_qkv=".qkv",
                        o=".proj", norm1=".norm1", norm2=".norm2",
                        gate=".mlp.gate_proj" if vt == "qwen2.5" else None,
                        up=".mlp.up_proj" if vt == "qwen2.5" else ".mlp.fc1",
                        down=".mlp.down_proj" if vt == "qwen2.5"
                        else ".mlp.fc2")
            if vt == "qwen2.5":
                self.norm_kind = "rms"
            self.ln_pre = None
            self.patch_conv = self._load_patch_conv(pre + "patch_embed.proj")
            self.pos_emb = None
        else:                                  # siglip (gemma3)
            keys = dict(layers="encoder.layers", attn=".self_attn",
                        q=".q_proj", k=".k_proj", v=".v_proj",
                        o=".out_proj", norm1=".layer_norm1",
                        norm2=".layer_norm2", gate=None,
                        up=".mlp.fc1", down=".mlp.fc2")
            self.ln_pre = None
            self.patch_conv = self._load_patch_conv(
                pre + "embeddings.patch_embedding")
            self.pos_emb = jnp.asarray(read_weight_f32(
                tfm, pre + "embeddings.position_embedding.weight"),
                jnp.bfloat16)

        self.layers = []
        for l in range(cfg.vision_num_layers):
            base = pre + keys["layers"] + f".{l}"
            if "fused_qkv" in keys:
                from exllamav2_tpu.quant.qtensor import slice_columns
                fused = load_linear(tfm, base + keys["attn"] +
                                    keys["fused_qkv"])
                hd = cfg.vision_head_dim
                nh = cfg.vision_num_attention_heads
                q = slice_columns(fused, 0, nh * hd)
                k = slice_columns(fused, nh * hd, 2 * nh * hd)
                v = slice_columns(fused, 2 * nh * hd, 3 * nh * hd)
            else:
                q = load_linear(tfm, base + keys["attn"] + keys["q"])
                k = load_linear(tfm, base + keys["attn"] + keys["k"])
                v = load_linear(tfm, base + keys["attn"] + keys["v"])
            gate = load_linear(tfm, base + keys["gate"]) \
                if keys.get("gate") else None
            self.layers.append(_VLayer(
                norm1=load_norm(tfm, base + keys["norm1"]),
                q=q, k=k, v=v,
                o=load_linear(tfm, base + keys["attn"] + keys["o"]),
                norm2=load_norm(tfm, base + keys["norm2"]),
                gate=gate,
                up=load_linear(tfm, base + keys["up"]),
                down=load_linear(tfm, base + keys["down"]),
            ))

        # output norm + multimodal projector
        self.out_norm = None
        self.mmp = self._load_mmp(tfm, arch)

        self._jit_cache = {}

    def _load_patch_conv(self, key):
        """Patch conv as a flattened linear: weight [Cout, Cin, (T,) H, W]
        -> [Cin*prod(patch), Cout]."""
        cfg = self.cfg
        tfm = cfg.tensor_file_map
        w = read_weight_f32(tfm, key + ".weight")
        cout = w.shape[0]
        w2 = w.reshape(cout, -1).T
        b = read_weight_f32(tfm, key + ".bias") \
            if key + ".bias" in tfm else None
        from exllamav2_tpu.quant.qtensor import from_dense
        return from_dense(w2, b)

    def _load_mmp(self, tfm, arch):
        cfg = self.cfg
        mp = arch.mmp_prefix
        vt = self.vt
        if vt == "pixtral":
            keys = [(mp + "linear_1", mp + "linear_2")]
            up = load_linear(tfm, keys[0][0])
            down = load_linear(tfm, keys[0][1])
            norm = load_norm(tfm, mp + "norm") \
                if mp + "norm.weight" in tfm else None
            patch_merger = load_linear(
                tfm, mp + "patch_merger.merging_layer") \
                if mp + "patch_merger.merging_layer.weight" in tfm else None
            return {"kind": "mlp", "up": up, "down": down, "norm": norm,
                    "patch_merger": patch_merger, "act": "gelu"}
        if vt in ("qwen2", "qwen2.5"):
            return {"kind": "mlp",
                    "norm": load_norm(tfm, mp + "ln_q"),
                    # qwen2.5's ln_q is an RMSNorm, qwen2's a LayerNorm
                    "norm_kind": "rms" if vt == "qwen2.5" else "layernorm",
                    "up": load_linear(tfm, mp + "mlp.0"),
                    "down": load_linear(tfm, mp + "mlp.2"),
                    "patch_merger": None, "act": "gelu"}
        # siglip/gemma3: soft-emb norm + input projection (+ avg pool)
        proj_key = mp + "mm_input_projection"
        w = None
        if proj_key + ".weight" in tfm:
            w = read_weight_f32(tfm, proj_key + ".weight")
            # stored [vision_hidden, lm_hidden] already (google keymap)
            if w.shape[0] != cfg.vision_hidden_size:
                w = w.T
        from exllamav2_tpu.quant.qtensor import from_dense
        return {"kind": "proj",
                "norm": load_norm(tfm, mp + "mm_soft_emb_norm"),
                "proj": from_dense(w) if w is not None else None}

    # ------------------------------------------------------------------

    def _rope_tables(self, p_h: int, p_w: int, thw=None):
        """Host-built rotary tables per image grid -> [S, head_dim]."""
        cfg = self.cfg
        hd = cfg.vision_head_dim
        if self.vt == "pixtral":
            maxedge = cfg.vision_size.get("longest_edge", 1024) // \
                cfg.vision_patch_size["width"]
            freqs = 1.0 / (cfg.vision_rope_theta **
                           (np.arange(0, hd, 2) / hd))
            h = np.arange(p_h)
            w = np.arange(p_w)
            fh = np.outer(h, freqs[::2])
            fw = np.outer(w, freqs[1::2])
            inv = np.concatenate([
                np.repeat(fh[:, None, :], p_w, axis=1),
                np.repeat(fw[None, :, :], p_h, axis=0),
            ], axis=-1).reshape(-1, hd // 2)
            inv = np.concatenate([inv, inv], axis=-1)
            return (jnp.asarray(np.sin(inv), jnp.float32),
                    jnp.asarray(np.cos(inv), jnp.float32))
        if self.vt in ("qwen2", "qwen2.5"):
            t, h, w = thw if thw is not None else (1, p_h, p_w)
            spm = cfg.vision_spatial_merge_size
            dim = hd // 2
            freqs = 1.0 / (cfg.vision_rope_theta **
                           (np.arange(0, dim, 2) / dim))
            hpos = np.arange(h)[:, None].repeat(w, 1)
            hpos = hpos.reshape(h // spm, spm, w // spm, spm)
            hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
            wpos = np.arange(w)[None, :].repeat(h, 0)
            wpos = wpos.reshape(h // spm, spm, w // spm, spm)
            wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
            fh = hpos[:, None] * freqs[None, :]
            fw = wpos[:, None] * freqs[None, :]
            emb = np.concatenate([fh, fw], axis=-1)     # [h*w, dim]
            emb = np.tile(emb, (t, 1))
            emb = np.concatenate([emb, emb], axis=-1)   # [S, hd]
            return (jnp.asarray(np.sin(emb), jnp.float32),
                    jnp.asarray(np.cos(emb), jnp.float32))
        return None, None                               # siglip: learned

    def _window_order(self, thw):
        """qwen2.5 window attention: reorder patches into windows
        (processor/qwen2.py get_window_index analog). -> (index [S'],
        cu_seqlens list) in merged units * merge^2."""
        cfg = self.cfg
        t, h, w = thw
        spm = cfg.vision_spatial_merge_size
        vms = (cfg.vision_window_size // spm //
               cfg.vision_patch_size["height"])
        lh, lw = h // spm, w // spm
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vms
        pad_w = (-lw) % vms
        nh = (lh + pad_h) // vms
        nw = (lw + pad_w) // vms
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, idx.dtype)
        padded[:, :lh, :lw] = idx
        padded = padded.reshape(t, nh, vms, nw, vms)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(t, nh * nw,
                                                         vms, vms)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        order = flat[flat != -100]
        cs = np.cumsum(seqlens) * spm ** 2
        cu = np.concatenate([[0], cs])
        cu = np.unique(cu)
        return order, cu

    def _forward_tower(self, patches, sin, cos, block_cu=None,
                       full_layers=()):
        """patches [S, d_v] bf16 -> [S, d_v] f32; static-shape jit body."""
        cfg = self.cfg
        nh = cfg.vision_num_attention_heads
        nkv = cfg.vision_num_key_value_heads
        hd = cfg.vision_head_dim
        x = patches
        s = x.shape[0]

        win_mask = None
        if block_cu is not None:
            seg = np.zeros(s, np.int32)
            seg[block_cu[:-1]] = 1
            seg = np.cumsum(seg)
            segj = jnp.asarray(seg)
            win_mask = segj[:, None] == segj[None, :]

        for li, lw in enumerate(self.layers):
            h = _vnorm(x, lw.norm1, self.norm_kind, self.eps)
            q = _dense(h, lw.q).reshape(s, nh, hd)
            k = _dense(h, lw.k).reshape(s, nkv, hd)
            v = _dense(h, lw.v).reshape(s, nkv, hd)
            q = _rope2d(q, sin, cos)
            k = _rope2d(k, sin, cos)
            scores = jnp.einsum("shd,thd->hst", q.astype(jnp.bfloat16),
                                k.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            scores = scores * (hd ** -0.5)
            if win_mask is not None and li not in full_layers:
                scores = jnp.where(win_mask[None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
            att = jnp.einsum("hst,thd->shd", probs,
                             v.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            o = _dense(att.reshape(s, nh * hd).astype(jnp.bfloat16), lw.o)
            x = x + o.astype(x.dtype)

            h2 = _vnorm(x, lw.norm2, self.norm_kind, self.eps)
            up = _dense(h2, lw.up)
            if lw.gate is not None:
                gate = _dense(h2, lw.gate)
                inter = _vact(gate, cfg.vision_hidden_act) * up
            else:
                inter = _vact(up, cfg.vision_hidden_act)
            down = _dense(inter.astype(jnp.bfloat16), lw.down)
            x = x + down.astype(x.dtype)
        return x

    def _project(self, x):
        """Tower output [S, d_v] -> LM embedding rows [S', d_lm]."""
        cfg = self.cfg
        mmp = self.mmp
        if mmp["kind"] == "proj":                   # gemma3
            s, dv = x.shape
            patches = int(round(s ** 0.5))
            tokens_side = int(cfg.vision_mm_tokens_per_image ** 0.5)
            ksz = max(patches // max(tokens_side, 1), 1)
            xs = x.reshape(patches, patches, dv)
            xs = xs.reshape(patches // ksz, ksz, patches // ksz, ksz, dv)
            pooled = xs.mean(axis=(1, 3)).reshape(-1, dv)
            h = _vnorm(pooled, mmp["norm"], "rms", self.eps)
            if mmp["proj"] is not None:
                h = jnp.dot(h.astype(jnp.bfloat16), mmp["proj"].weight,
                            preferred_element_type=jnp.float32)
            return h
        # mlp merger (pixtral / qwen2 / mistral3): the merger norm (ln_q)
        # normalizes per-patch features BEFORE the spatial merge concat
        if mmp["norm"] is not None:
            default_kind = "layernorm" if self.vt != "pixtral" else "rms"
            x = _vnorm(x, mmp["norm"], mmp.get("norm_kind", default_kind),
                       self.eps)
        merge = cfg.vision_spatial_merge_size ** 2
        if merge > 1:
            x = x.reshape(x.shape[0] // merge, merge * x.shape[1])
        if mmp.get("patch_merger") is not None:
            x = _dense(x.astype(jnp.bfloat16), mmp["patch_merger"])
        h = _dense(x.astype(jnp.bfloat16), mmp["up"])
        h = _vact(h, mmp["act"])
        return _dense(h.astype(jnp.bfloat16), mmp["down"])

    def process(self, pixels, patches_size=None, thw_grid=None):
        """Preprocessed pixels -> LM-space embedding rows [S', d_lm]."""
        cfg = self.cfg
        vt = self.vt
        if vt in ("qwen2", "qwen2.5"):
            patches = jnp.asarray(pixels, jnp.bfloat16)
            t, h, w = thw_grid
            p_h, p_w = h, w
        else:
            px = np.asarray(pixels)
            c, ih, iw = px.shape
            ph = cfg.vision_patch_size["height"]
            pw = cfg.vision_patch_size["width"]
            p_h, p_w = ih // ph, iw // pw
            # stride==kernel conv -> patch flatten + matmul
            px = px.reshape(c, p_h, ph, p_w, pw)
            px = px.transpose(1, 3, 0, 2, 4).reshape(p_h * p_w,
                                                     c * ph * pw)
            patches = jnp.asarray(px, jnp.bfloat16)

        x = _dense(patches, self.patch_conv).astype(jnp.bfloat16)
        if self.ln_pre is not None:
            x = _vnorm(x, self.ln_pre, "rms", self.eps)
        if self.pos_emb is not None:
            x = x + self.pos_emb[:x.shape[0]]

        sin, cos = self._rope_tables(p_h, p_w, thw_grid)

        block_cu = None
        full_layers = ()
        order = None
        if self.vt == "qwen2.5" and cfg.vision_window_size:
            order, block_cu = self._window_order(thw_grid)
            unit = cfg.vision_spatial_merge_size ** 2
            s = x.shape[0]
            xs = x.reshape(s // unit, unit, -1)[order].reshape(s, -1)
            x = xs
            if sin is not None:
                ss = sin.reshape(s // unit, unit, -1)[order].reshape(
                    s, sin.shape[-1])
                cc = cos.reshape(s // unit, unit, -1)[order].reshape(
                    s, cos.shape[-1])
                sin, cos = jnp.asarray(ss), jnp.asarray(cc)
            full_layers = tuple(cfg.vision_fullatt_block_indexes or ())

        x = self._forward_tower(x, sin, cos, block_cu, full_layers)
        out = self._project(x.astype(jnp.bfloat16))
        if order is not None:
            rev = np.argsort(order)
            out = out[jnp.asarray(rev)]
        return out

    # ------------------------------------------------------------------

    def get_image_embeddings(self, model, tokenizer, image,
                             text_alias: str | None = None) -> MMEmbedding:
        """Image (PIL or [H, W, 3] array) -> MMEmbedding for the dynamic
        generator (vision_tower.py:352-430 analog)."""
        cfg = self.cfg
        pixels, new_size, thw = processing.preprocess(cfg, image)
        fx = new_size[0] // cfg.vision_patch_size["width"]
        fy = new_size[1] // cfg.vision_patch_size["height"]
        emb = self.process(pixels, (fy, fx), thw)
        emb, pre, post = processing.postprocess(
            cfg, model.weights, tokenizer, emb, fy, fx)
        mme = MMEmbedding(emb, text_alias=text_alias,
                          thw_grid=thw or (1, fy, fx),
                          pre_tokens=pre, post_tokens=post)
        mme.metadata.update({
            "preprocessed_size": new_size,
            "patches_size": (fy, fx),
        })
        return mme

    def get_video_embeddings(self, model, tokenizer, video,
                             text_alias: str | None = None) -> MMEmbedding:
        """Video (list of frames) -> MMEmbedding (qwen2 towers only)."""
        assert self.vt in ("qwen2", "qwen2.5"), \
            "video embeddings require a qwen2-family tower"
        cfg = self.cfg
        pixels, new_size, thw = processing.preprocess(cfg, list(video))
        fx = new_size[0] // cfg.vision_patch_size["width"]
        fy = new_size[1] // cfg.vision_patch_size["height"]
        emb = self.process(pixels, (fy, fx), thw)
        emb, pre, post = processing.postprocess(
            cfg, model.weights, tokenizer, emb, fy, fx)
        mme = MMEmbedding(emb, text_alias=text_alias, thw_grid=thw,
                          pre_tokens=pre, post_tokens=post)
        mme.metadata.update({"preprocessed_size": new_size,
                             "patches_size": (fy, fx)})
        return mme
