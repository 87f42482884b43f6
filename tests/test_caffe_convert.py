"""Caffe .caffemodel -> blob pickle converter (wire-format decode, BN fold,
MSRA name normalization)."""

import pickle

import numpy as np
import pytest

from sad_tpu.tools.pickle_caffe_blobs import (
    convert_caffemodel,
    main as convert_main,
    normalize_resnet_name,
    parse_caffemodel,
)


# ------------------------------------------------------ protobuf encoder
def _vint(x: int) -> bytes:
    out = b""
    while True:
        b7 = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _key(num, wt):
    return _vint((num << 3) | wt)


def _ld(num, data: bytes) -> bytes:
    return _key(num, 2) + _vint(len(data)) + data


def _blob(arr: np.ndarray, packed=True) -> bytes:
    shape_msg = b"".join(_key(1, 0) + _vint(int(d)) for d in arr.shape)
    if packed:
        data = _ld(5, arr.astype("<f4").tobytes())
    else:  # unpacked repeated floats (wire type 5 per element)
        data = b"".join(
            _key(5, 5) + np.float32(v).tobytes() for v in arr.reshape(-1)
        )
    return data + _ld(7, shape_msg)


def _layer(name, ltype, blobs) -> bytes:
    msg = _ld(1, name.encode()) + _ld(2, ltype.encode())
    for b in blobs:
        msg += _ld(7, _blob(b))
    return _ld(100, msg)


def _write_caffemodel(path, layers):
    with open(path, "wb") as f:
        f.write(b"".join(layers))


class TestNameNormalization:
    def test_msra_names(self):
        assert normalize_resnet_name("res4b11_branch2c") == "res4_11_branch2c"
        assert normalize_resnet_name("res2a_branch1") == "res2_0_branch1"
        assert normalize_resnet_name("res3d_branch2b") == "res3_3_branch2b"
        assert normalize_resnet_name("conv1") == "conv1"
        assert normalize_resnet_name("fc1000") == "fc1000"


class TestConvert:
    def _model(self, tmp_path):
        rng = np.random.RandomState(0)
        conv1_w = rng.randn(8, 3, 3, 3).astype(np.float32)
        mean = rng.randn(8).astype(np.float32)
        var = np.abs(rng.randn(8)).astype(np.float32) + 0.5
        scale = rng.randn(8).astype(np.float32)
        bias = rng.randn(8).astype(np.float32)
        res_w = rng.randn(4, 8, 1, 1).astype(np.float32)
        res_b = rng.randn(4).astype(np.float32)
        fc_w = rng.randn(10, 4).astype(np.float32)
        fc_b = rng.randn(10).astype(np.float32)
        p = tmp_path / "net.caffemodel"
        _write_caffemodel(
            p,
            [
                _layer("conv1", "Convolution", [conv1_w]),  # no bias
                _layer("bn_conv1", "BatchNorm",
                       [mean, var, np.ones(1, np.float32)]),
                _layer("scale_conv1", "Scale", [scale, bias]),
                _layer("res2a_branch1", "Convolution", [res_w, res_b]),
                _layer("fc1000", "InnerProduct", [fc_w, fc_b]),
                _layer("relu1", "ReLU", []),  # parameterless
            ],
        )
        return p, dict(conv1_w=conv1_w, mean=mean, var=var, scale=scale,
                       bias=bias, res_w=res_w, res_b=res_b, fc_w=fc_w)

    def test_parse_and_convert(self, tmp_path):
        p, ref = self._model(tmp_path)
        layers = parse_caffemodel(str(p))
        assert [l["name"] for l in layers] == [
            "conv1", "bn_conv1", "scale_conv1", "res2a_branch1",
            "fc1000", "relu1",
        ]
        blobs = convert_caffemodel(str(p))
        # conv1: weights + synthesized zero bias
        np.testing.assert_array_equal(blobs["conv1_w"], ref["conv1_w"])
        np.testing.assert_array_equal(blobs["conv1_b"], np.zeros(8))
        # BN fold (ref: pickle_caffe_blobs.py:141-152)
        std = np.sqrt(ref["var"] + 1e-5)
        np.testing.assert_allclose(
            blobs["res_conv1_bn_s"], ref["scale"] / std, rtol=1e-6
        )
        np.testing.assert_allclose(
            blobs["res_conv1_bn_b"],
            ref["bias"] - ref["mean"] * ref["scale"] / std, rtol=1e-5,
        )
        # MSRA name normalization on parameterized layers
        np.testing.assert_array_equal(
            blobs["res2_0_branch1_w"], ref["res_w"]
        )
        np.testing.assert_array_equal(blobs["res2_0_branch1_b"], ref["res_b"])
        assert "fc1000_w" in blobs and "fc1000_b" in blobs
        assert not any("relu" in k for k in blobs)

    def test_unpacked_floats(self, tmp_path):
        arr = np.arange(6, dtype=np.float32).reshape(2, 3)
        p = tmp_path / "u.caffemodel"
        msg = _ld(1, b"ip") + _ld(2, b"InnerProduct") + _ld(
            7, _blob(arr, packed=False) )
        _write_caffemodel(p, [_ld(100, msg)])
        layers = parse_caffemodel(str(p))
        np.testing.assert_array_equal(layers[0]["blobs"][0], arr)

    def test_cli_pickle_loads_into_params(self, tmp_path):
        import jax

        p, ref = self._model(tmp_path)
        out = tmp_path / "w.pkl"
        convert_main(["--caffemodel", str(p), "--output", str(out)])
        with open(out, "rb") as f:
            data = pickle.load(f)
        assert "blobs" in data and "conv1_w" in data["blobs"]
        # the folded stem maps into a model param tree via the standard
        # reference-blob loader (OIHW -> HWIO transpose included)
        from sad_tpu.train.checkpoint import reference_blobs_to_flax

        template = {
            "conv1": {"kernel": np.zeros((3, 3, 3, 8), np.float32)},
            "res_conv1_bn": {"s": np.zeros(8, np.float32),
                             "b": np.zeros(8, np.float32)},
        }
        params, loaded, skipped = reference_blobs_to_flax(
            data["blobs"], template
        )
        assert any("conv1" in str(p_) for p_ in loaded)
        np.testing.assert_allclose(
            np.asarray(params["conv1"]["kernel"]),
            ref["conv1_w"].transpose(2, 3, 1, 0),
        )
        std = np.sqrt(ref["var"] + 1e-5)
        np.testing.assert_allclose(
            np.asarray(params["res_conv1_bn"]["s"]), ref["scale"] / std,
            rtol=1e-6,
        )
