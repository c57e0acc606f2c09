"""Safetensors reader/writer unit tests (reference tests/test_stloader.py
analog, hermetic)."""

import os

import numpy as np

from exllamav2_tpu.stloader import (
    STFile, TensorFileMap, write_safetensors, read_weight_f32,
    bf16_bits_to_f32)


def test_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.standard_normal((4, 8)).astype(np.float32),
        "b": rng.standard_normal((3, 3)).astype(np.float16),
        "c": rng.integers(0, 2 ** 31, (5,)).astype(np.int32),
        "d": rng.integers(0, 255, (2, 2)).astype(np.uint8),
    }
    p = str(tmp_path / "t.safetensors")
    write_safetensors(p, tensors)
    st = STFile(p)
    for k, v in tensors.items():
        got = st.get_tensor(k)
        assert got.shape == v.shape
        assert np.array_equal(np.asarray(got), v), k
    st.close()


def test_bf16_passthrough(tmp_path):
    x = np.array([1.5, -2.25, 0.00390625], np.float32)
    bits = (x.view(np.uint32) >> 16).astype(np.uint16)   # exact bf16 values
    p = str(tmp_path / "b.safetensors")
    write_safetensors(p, {"w": bits}, dtypes={"w": "BF16"})
    st = STFile(p)
    assert st.get_dtype("w") == "BF16"
    raw = st.get_tensor("w")
    assert np.array_equal(bf16_bits_to_f32(raw), x)
    st.close()


def test_tensor_file_map_multi_shard(tmp_path):
    write_safetensors(str(tmp_path / "m-1.safetensors"),
                      {"x": np.ones((2, 2), np.float16)})
    write_safetensors(str(tmp_path / "m-2.safetensors"),
                      {"y": np.zeros((3,), np.float32)})
    tfm = TensorFileMap(str(tmp_path))
    assert "x" in tfm and "y" in tfm
    assert tfm.get_shape("y") == [3]
    assert read_weight_f32(tfm, "x").dtype == np.float32
    assert tfm.has_prefix("x")
    assert not tfm.has_prefix("z")
    tfm.close()


def test_zero_copy_view(tmp_path):
    """get_tensor returns an mmap view, not a copy (load-time memory)."""
    big = np.arange(1 << 16, dtype=np.int32).reshape(256, 256)
    p = str(tmp_path / "z.safetensors")
    write_safetensors(p, {"w": big})
    st = STFile(p)
    t = st.get_tensor("w")
    assert not t.flags["OWNDATA"]          # backed by the mmap buffer
    assert np.array_equal(t, big)
    st.close()
