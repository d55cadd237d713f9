"""Raw-ONNX initializer parser (protobuf wire format, no onnx dep)."""

import numpy as np

from asr_streaming_tpu.tools.onnx_weights import (
    encode_test_model, parse_onnx_initializers,
)


def test_roundtrip_initializers():
    rng = np.random.default_rng(0)
    tensors = {
        "stft.basis": rng.standard_normal((129, 1, 256)).astype(np.float32),
        "lstm.weight_ih": rng.standard_normal((512, 128)).astype(np.float32),
        "decoder.bias": rng.standard_normal(1).astype(np.float32),
        "shape_info": np.asarray([2, 1, 128], np.int64),
    }
    blob = encode_test_model(tensors)
    parsed = parse_onnx_initializers(blob)
    assert set(parsed) == set(tensors)
    for name, want in tensors.items():
        np.testing.assert_array_equal(parsed[name], want)
        assert parsed[name].dtype == want.dtype


def test_large_varint_lengths():
    # >127-byte payloads exercise multi-byte varints
    big = np.arange(100_000, dtype=np.float32).reshape(100, 1000)
    parsed = parse_onnx_initializers(encode_test_model({"big": big}))
    np.testing.assert_array_equal(parsed["big"], big)
