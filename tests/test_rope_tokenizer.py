"""RoPE scaling variants + HF tokenizer backend tests."""

import json
import math
import os
from types import SimpleNamespace

import numpy as np
import pytest

from exllamav2_tpu.ops.rope import rope_params, build_sincos, apply_rope
from exllamav2_tpu.architecture import RopeStyle


def _cfg(**kw):
    base = dict(rotary_dim=64, head_dim=64, rotary_embedding_base=10000.0,
                rope_scaling=None, max_position_embeddings=2048,
                original_max_position_embeddings=None, max_seq_len=2048)
    base.update(kw)
    return SimpleNamespace(**base)


def test_default_rope():
    inv, scale = rope_params(_cfg())
    assert scale == 1.0
    assert np.allclose(inv[0], 1.0)
    assert inv[-1] < 1e-3


def test_linear_scaling():
    inv0, _ = rope_params(_cfg())
    inv, _ = rope_params(_cfg(rope_scaling={"type": "linear", "factor": 4.0}))
    assert np.allclose(inv, inv0 / 4.0)


def test_ntk_scaling():
    inv0, _ = rope_params(_cfg())
    inv, _ = rope_params(_cfg(rope_scaling={"type": "ntk", "alpha": 2.0}))
    # NTK raises the base -> lower frequencies, most at the tail
    assert inv[-1] < inv0[-1]
    assert np.isclose(inv[0], inv0[0])


def test_dynamic_ntk_scaling():
    """HF dynamic-NTK: base grows with seq_len/original (ADVICE fix);
    at seq_len == original the table is unscaled."""
    inv0, _ = rope_params(_cfg())
    same, _ = rope_params(_cfg(rope_scaling={"type": "dynamic",
                                             "factor": 4.0}))
    assert np.allclose(same, inv0)      # max_seq == original -> alpha 1
    cfg = _cfg(rope_scaling={"type": "dynamic", "factor": 4.0,
                             "original_max_position_embeddings": 512})
    cfg.max_seq_len = 2048
    inv, _ = rope_params(cfg)
    assert inv[-1] < inv0[-1]
    assert np.isclose(inv[0], inv0[0])


def test_dynamic_ntk_per_position_table():
    """The baked table applies alpha per position: rows below the
    original context window exactly match the unscaled table (HF
    recomputes alpha=1 at short contexts), rows beyond diverge."""
    cfg0 = _cfg()
    cfg = _cfg(rope_scaling={"type": "dynamic", "factor": 4.0,
                             "original_max_position_embeddings": 512})
    cfg.max_seq_len = 2048
    s0, c0 = build_sincos(cfg0)
    s1, c1 = build_sincos(cfg)
    s0, c0, s1, c1 = map(np.asarray, (s0, c0, s1, c1))
    assert np.allclose(s1[:512], s0[:512]) and \
        np.allclose(c1[:512], c0[:512])
    assert not np.allclose(s1[2000], s0[2000])


def test_llama3_scaling():
    rs = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
          "high_freq_factor": 4.0, "original_max_position_embeddings": 8192}
    inv0, _ = rope_params(_cfg())
    inv, _ = rope_params(_cfg(rope_scaling=rs))
    # high-frequency components untouched, low-frequency divided by factor
    assert np.isclose(inv[0], inv0[0])
    assert np.isclose(inv[-1], inv0[-1] / 8.0, rtol=1e-6)


def test_yarn_scaling():
    rs = {"rope_type": "yarn", "factor": 4.0,
          "original_max_position_embeddings": 2048}
    inv0, _ = rope_params(_cfg())
    inv, scale = rope_params(_cfg(rope_scaling=rs))
    assert scale > 1.0                      # yarn attention scaling
    assert np.isclose(inv[0], inv0[0], rtol=1e-3)   # extrapolated head
    assert inv[-1] < inv0[-1]               # interpolated tail


def test_longrope_scaling():
    rs = {"rope_type": "longrope", "long_factor": [2.0] * 32,
          "short_factor": [1.0] * 32,
          "original_max_position_embeddings": 1024}
    inv_short, s_short = rope_params(_cfg(rope_scaling=rs, max_seq_len=512))
    inv_long, s_long = rope_params(_cfg(rope_scaling=rs, max_seq_len=4096))
    assert np.allclose(inv_long, inv_short / 2.0)
    assert s_long > 1.0 and s_short == 1.0


def test_apply_rope_styles():
    import jax.numpy as jnp
    cfg = _cfg()
    sin, cos = build_sincos(cfg, max_len=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 2, 64)), jnp.float32)
    for style in (RopeStyle.NEOX, RopeStyle.GPTJ):
        y = apply_rope(x, sin, cos, style)
        assert y.shape == x.shape
        # position 0 is identity (angle 0)
        assert np.allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]),
                           atol=1e-5)
        # rotation preserves pairwise norms
        assert np.allclose(np.linalg.norm(np.asarray(y), axis=-1),
                           np.linalg.norm(np.asarray(x), axis=-1),
                           rtol=1e-4)


def test_hf_tokenizer_backend(tmp_path):
    """Round-trip through a real tokenizer.json (HF tokenizers lib)."""
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers.pre_tokenizers import Whitespace

    tok = HFTok(BPE(unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    trainer = BpeTrainer(special_tokens=["<unk>", "<s>", "</s>"],
                         vocab_size=200)
    tok.train_from_iterator(
        ["hello world", "the quick brown fox", "hello there"] * 20, trainer)
    d = str(tmp_path)
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>"}, f)

    from exllamav2_tpu.tokenizer import Tokenizer
    t = Tokenizer(d)
    ids = t.encode("hello world", add_bos=True)
    assert ids[0] == t.bos_token_id
    assert "hello" in t.decode(ids)
    assert t.eos_token_id is not None
    assert t.vocab_size >= 30   # tiny training corpus

def test_prefix_ids_astral_plane():
    """prefix_ids must include pieces continuing with astral-plane
    codepoints (a \\uffff sentinel upper bound would exclude them)."""
    from exllamav2_tpu.tokenizer import ByteTokenizer

    class T(ByteTokenizer):
        def __init__(self):
            super().__init__(vocab_size=4)
            self._id_to_piece = ["ab", "ab\U0001F600", "abc", "b"]

    t = T()
    ids = set(int(i) for i in t.prefix_ids("ab"))
    assert ids == {0, 1, 2}


def test_decoded_piece_list():
    """SP markers and byte tokens decode; byte-BPE alphabet inverts."""
    from exllamav2_tpu.tokenizer import ByteTokenizer

    class SP(ByteTokenizer):
        def __init__(self):
            super().__init__(vocab_size=3)
            self._id_to_piece = ["▁the", "<0x0A>", "x"]

    class BPE(ByteTokenizer):
        def __init__(self):
            super().__init__(vocab_size=3)
            self._id_to_piece = ["Ġthe", "Ċ", "<|endoftext|>"]

    assert SP().get_id_to_decoded_list() == [" the", "\n", "x"]
    assert BPE().get_id_to_decoded_list() == [" the", "\n", "<|endoftext|>"]
