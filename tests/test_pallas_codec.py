"""ops/pallas/codec.py kernels vs their XLA twins (interpret mode on CPU;
the compiled path is A/B'd on chip by tools/pallas_codec_bench.py).

All kernels require B == 128 (batch in lanes) — the throughput point of
record; f32 here for exact comparisons (accumulation-order tolerance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optimaltextures_tpu.ops.convops import (conv2d_nhwc, maxpool_2x2_ceil,
                                             reflect_pad,
                                             upsample_nearest_2x)
from optimaltextures_tpu.ops.pallas import codec

B, H, W = 128, 32, 32
TOL = 2e-5


@pytest.fixture(scope="module")
def data():
    key = jax.random.key(7)
    ks = [jax.random.fold_in(key, i) for i in range(12)]
    return {
        "x": jax.random.normal(ks[0], (B, H, W, 64), jnp.float32),
        "xc": jax.random.normal(ks[1], (B, H // 2, W // 2, 64), jnp.float32),
        "rgb": jax.random.normal(ks[2], (B, H, W, 3), jnp.float32),
        "w": jax.random.normal(ks[3], (3, 3, 64, 64), jnp.float32) * 0.1,
        "b": jax.random.normal(ks[4], (64,), jnp.float32) * 0.1,
        "wf": jax.random.normal(ks[5], (3, 3, 64, 3), jnp.float32) * 0.1,
        "bf": jax.random.normal(ks[6], (3,), jnp.float32) * 0.1,
        "wrn": jax.random.normal(ks[7], (1, 1, 3, 3), jnp.float32) * 0.5,
        "brn": jax.random.normal(ks[8], (3,), jnp.float32) * 0.1,
        "we": jax.random.normal(ks[9], (3, 3, 3, 64), jnp.float32) * 0.1,
        "be": jax.random.normal(ks[10], (64,), jnp.float32) * 0.1,
    }


def _maxerr(a, b):
    return float(jnp.max(jnp.abs(a - b)))


def test_conv3x3_p2(data):
    ref = jax.nn.relu(conv2d_nhwc(reflect_pad(data["x"]), data["w"],
                                  data["b"]))
    wr, b2 = codec.pack_conv_p2(data["w"], data["b"])
    got = codec.tcb_to_nhwc(codec.conv3x3_p2(
        codec.nhwc_to_tcb(data["x"]), wr, b2, relu=True, interpret=True))
    assert _maxerr(ref, got) < TOL


def test_conv3x3_p2_no_relu(data):
    ref = conv2d_nhwc(reflect_pad(data["x"]), data["w"], data["b"])
    wr, b2 = codec.pack_conv_p2(data["w"], data["b"])
    got = codec.tcb_to_nhwc(codec.conv3x3_p2(
        codec.nhwc_to_tcb(data["x"]), wr, b2, relu=False, interpret=True))
    assert _maxerr(ref, got) < TOL


def test_conv3x3_p2_pool(data):
    ref = maxpool_2x2_ceil(jax.nn.relu(conv2d_nhwc(reflect_pad(data["x"]),
                                                   data["w"], data["b"])))
    wr, b2 = codec.pack_conv_p2(data["w"], data["b"])
    got = codec.tcb_to_nhwc(codec.conv3x3_p2(
        codec.nhwc_to_tcb(data["x"]), wr, b2, relu=True, pool=True,
        interpret=True))
    assert _maxerr(ref, got) < TOL


def test_upconv_p2(data):
    ref = jax.nn.relu(conv2d_nhwc(reflect_pad(
        upsample_nearest_2x(data["xc"])), data["w"], data["b"]))
    wa0, wa1, bu = codec.pack_upconv_fold(data["w"], data["b"])
    got = codec.tcb_to_nhwc(codec.upconv_p2(
        codec.nhwc_to_tcb(data["xc"]), wa0, wa1, bu, interpret=True))
    assert _maxerr(ref, got) < TOL


def test_final_to_rgb(data):
    # reference: decoder final conv then the encoder's 1x1 renorm
    ref = conv2d_nhwc(conv2d_nhwc(reflect_pad(data["x"]), data["wf"],
                                  data["bf"]), data["wrn"], data["brn"])
    w3, b3 = codec.pack_final_rgb(data["wf"], data["bf"], data["wrn"],
                                  data["brn"])
    out = codec.final_to_rgb(codec.nhwc_to_tcb(data["x"]), w3, b3,
                             interpret=True)
    assert out.shape == (H, W, codec.RGB_PAD, B)
    got = codec.tcb_to_nhwc(out)[..., :3]
    assert _maxerr(ref, got) < TOL


def test_rgb_to_relu1(data):
    ref = jax.nn.relu(conv2d_nhwc(reflect_pad(data["rgb"]), data["we"],
                                  data["be"]))
    rgb_pad = jnp.pad(data["rgb"], ((0, 0),) * 3 + ((0, codec.RGB_PAD - 3),))
    we, be = codec.pack_entry_rgb(data["we"], data["be"])
    got = codec.tcb_to_nhwc(codec.rgb_to_relu1(
        codec.nhwc_to_tcb(rgb_pad), we, be, out_dtype=jnp.float32,
        interpret=True))
    assert _maxerr(ref, got) < TOL


def test_roundtrip_chain(data):
    """decode-tail -> encode-head exactly as core's stage seam composes
    them: upconv -> final(+renorm) -> entry -> conv1_2+pool."""
    x = data["xc"]
    fine = jax.nn.relu(conv2d_nhwc(reflect_pad(upsample_nearest_2x(x)),
                                   data["w"], data["b"]))
    rgb = conv2d_nhwc(conv2d_nhwc(reflect_pad(fine), data["wf"],
                                  data["bf"]), data["wrn"], data["brn"])
    r1 = jax.nn.relu(conv2d_nhwc(reflect_pad(rgb), data["we"], data["be"]))
    ref = maxpool_2x2_ceil(jax.nn.relu(conv2d_nhwc(reflect_pad(r1),
                                                   data["w"], data["b"])))

    wa0, wa1, bu = codec.pack_upconv_fold(data["w"], data["b"])
    w3, b3 = codec.pack_final_rgb(data["wf"], data["bf"], data["wrn"],
                                  data["brn"])
    we, be = codec.pack_entry_rgb(data["we"], data["be"])
    wr, b2 = codec.pack_conv_p2(data["w"], data["b"])

    t = codec.upconv_p2(codec.nhwc_to_tcb(x), wa0, wa1, bu, interpret=True)
    t = codec.final_to_rgb(t, w3, b3, interpret=True)
    t = codec.rgb_to_relu1(t, we, be, out_dtype=jnp.float32, interpret=True)
    t = codec.conv3x3_p2(t, wr, b2, relu=True, pool=True, interpret=True)
    got = codec.tcb_to_nhwc(t)
    assert _maxerr(ref, got) < 1e-4
