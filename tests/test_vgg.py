"""Codec parity: the JAX NHWC encoder/decoder must reproduce the reference's
torch activations on the converted checkpoints within float tolerance.

The torch side is reconstructed here directly from the .pth state dicts with
torch.nn.functional ops (reflection pad, valid conv, ceil-mode pool, nearest
upsample) — the exact op sequence of /root/reference/vgg.py:14-135 — so the
test exercises both the npz conversion and the XLA forward pass.
"""

import numpy as np
import pytest

import torch
import torch.nn.functional as F

import jax.numpy as jnp

from optimaltextures_tpu.models import arch, weights
from optimaltextures_tpu.models.vgg import decode, encode

HAVE = weights.available_depths()


def torch_run_stack(sd_convs, specs, x):
    """Reference op sequence in torch, NCHW, from (weight OIHW, bias) pairs."""
    for (w, b), (_, _, k, pre, post) in zip(sd_convs, specs):
        if pre == "pool":
            x = F.max_pool2d(x, 2, 2, ceil_mode=True)
        elif pre == "up":
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        if k == 3:
            x = F.pad(x, (1, 1, 1, 1), mode="reflect")
        x = F.conv2d(x, w, b)
        if post == "relu":
            x = F.relu(x)
    return x


def load_torch_convs(pth, specs):
    sd = torch.load(pth, map_location="cpu")
    idxs = arch.torch_sequential_indices(specs)
    return [(sd[f"{i}.weight"], sd[f"{i}.bias"]) for i in idxs]


@pytest.mark.parametrize("depth", HAVE)
def test_encoder_parity(depth, rng):
    img = rng.random((2, 64, 96, 3), dtype=np.float32)
    specs = arch.encoder_specs(depth)
    tc = load_torch_convs(f"/root/reference/models/vgg_normalised_conv{depth}_1.pth", specs)
    ref = torch_run_stack(tc, specs, torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    params = weights.load_encoder_params(depth)
    got = np.asarray(encode([(jnp.asarray(w), jnp.asarray(b)) for w, b in params], depth,
                            jnp.asarray(img)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("depth", HAVE)
def test_decoder_parity(depth, rng):
    c = arch.FEATURE_CHANNELS[depth]
    feat = rng.random((1, 16, 24, c), dtype=np.float32) * 3.0
    specs = arch.decoder_specs(depth)
    tc = load_torch_convs(f"/root/reference/models/feature_invertor_conv{depth}_1.pth", specs)
    ref = torch_run_stack(tc, specs, torch.from_numpy(feat.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    params = weights.load_decoder_params(depth)
    got = np.asarray(decode([(jnp.asarray(w), jnp.asarray(b)) for w, b in params], depth,
                            jnp.asarray(feat)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("depth", HAVE)
def test_encode_decode_roundtrip_shapes(depth, rng):
    """Decoder(d) inverts Encoder(d)'s spatial geometry exactly."""
    img = rng.random((1, 64, 64, 3), dtype=np.float32)
    ep = [(jnp.asarray(w), jnp.asarray(b)) for w, b in weights.load_encoder_params(depth)]
    dp = [(jnp.asarray(w), jnp.asarray(b)) for w, b in weights.load_decoder_params(depth)]
    feat = encode(ep, depth, jnp.asarray(img))
    s = arch.FEATURE_STRIDE[depth]
    assert feat.shape == (1, 64 // s, 64 // s, arch.FEATURE_CHANNELS[depth])
    out = decode(dp, depth, feat)
    assert out.shape == img.shape


def test_odd_size_ceil_pool(rng):
    """ceil_mode max-pool must match torch on odd spatial sizes."""
    if 2 not in HAVE:
        pytest.skip("need depth-2 weights")
    img = rng.random((1, 45, 67, 3), dtype=np.float32)
    specs = arch.encoder_specs(2)
    tc = load_torch_convs("/root/reference/models/vgg_normalised_conv2_1.pth", specs)
    ref = torch_run_stack(tc, specs, torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    params = weights.load_encoder_params(2)
    got = np.asarray(encode([(jnp.asarray(w), jnp.asarray(b)) for w, b in params], 2,
                            jnp.asarray(img)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("depth", [max(HAVE)] if HAVE else [])
def test_encode_taps_matches_separate_encodes(depth, rng):
    """Multi-tap encode must produce exactly the per-depth truncated
    encoders' outputs (same weights, same op sequence prefix)."""
    from optimaltextures_tpu.models.vgg import encode_taps

    img = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    deep_params = [(jnp.asarray(w), jnp.asarray(b))
                   for w, b in weights.load_encoder_params(depth)]
    taps = encode_taps(deep_params, depth, img)
    assert len(taps) == depth
    for d in range(1, depth + 1):
        params_d = [(jnp.asarray(w), jnp.asarray(b))
                    for w, b in weights.load_encoder_params(d)]
        ref = encode(params_d, d, img)
        np.testing.assert_allclose(np.asarray(taps[d - 1]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Framework-native orbax export/import preserves every conv exactly."""
    path = str(tmp_path / "ckpt")
    weights.save_orbax(None, path)
    restored = weights.load_orbax(path)
    assert set(restored) == set(HAVE)
    for depth in HAVE:
        orig = weights.load_encoder_params(depth)
        for (w0, b0), (w1, b1) in zip(orig, restored[depth]["encoder"]):
            np.testing.assert_array_equal(w0, w1)
            np.testing.assert_array_equal(b0, b1)
