"""The fast_codec (Pallas relu1-scale) run path vs the XLA codec, end to
end on CPU (interpret-mode kernels; batch 128 = the kernels' lane width).

Same rotation stream, same OT programs — only the codec section differs,
so outputs must agree to accumulation-order tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.models import fastcodec
from optimaltextures_tpu.models.vgg import synthetic_bank


def _run(fast, depth, size=32, batch=128):
    cfg = OptexConfig(size=size, passes=1, iters=4, seed=3, batch=batch,
                      depth=depth, style=["unused"], fast_codec=fast)
    bank = synthetic_bank(depth, seed=1)
    synth = core.Synthesizer(cfg, bank=bank)
    key = jax.random.key(0)
    noise = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    style = [np.asarray(jax.random.uniform(
        jax.random.fold_in(key, 1), (1, size, size, 3), jnp.float32))]
    return np.asarray(synth.run(noise, style, key=jax.random.key(9)))


@pytest.mark.parametrize("depth", [2])  # layers [2, 1]: both stage branches

def test_fast_codec_matches_xla(depth):
    ref = _run(False, depth)
    got = _run(True, depth)
    assert ref.shape == got.shape
    err = np.max(np.abs(ref - got))
    assert err < 5e-4, err
    # and it actually took a different program path: exact-zero diff would
    # mean the gate silently fell back
    assert err > 0.0


def test_eligibility_gate():
    ok = fastcodec.eligible(128, [(512, 512), (256, 256)], "reflect",
                            jnp.bfloat16)
    assert ok
    assert not fastcodec.eligible(64, [(512, 512)], "reflect", jnp.bfloat16)
    assert not fastcodec.eligible(128, [(512, 512)], "wrap", jnp.bfloat16)
    assert not fastcodec.eligible(128, [(512, 520)], "reflect", jnp.bfloat16)
    assert not fastcodec.eligible(128, [(16, 512)], "reflect", jnp.bfloat16)


def test_head_tail_wiring_depth4():
    """encode_head/decode_tail vs vgg.encode/decode at depth 4: pins the
    spec-slice wiring of the 128-ch kernel scale (upconv128, 128->64,
    64->128, 128->128+pool) without the cost of a full interpret-mode run
    (the kernels themselves are unit-tested in test_pallas_codec)."""
    from optimaltextures_tpu.models import vgg

    key = jax.random.key(11)
    size, batch, depth = 32, 128, 4
    bank = synthetic_bank(depth, seed=2)
    enc, dec = bank.enc_params[depth], bank.dec_params[depth]
    px = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)

    ref_feat = vgg.encode(enc, depth, px)
    rgb8 = fastcodec.pixels_to_rgb8(enc[0], px)
    got_feat = fastcodec.encode_head(enc, depth, rgb8, jnp.float32)
    assert np.max(np.abs(np.asarray(ref_feat - got_feat))) < 2e-4

    ref_px = vgg.decode(dec, depth, ref_feat)
    got_rgb8 = fastcodec.decode_tail(dec, depth, ref_feat, None, jnp.float32)
    got_px = fastcodec.rgb8_to_pixels(got_rgb8, jnp.float32)
    assert np.max(np.abs(np.asarray(ref_px - got_px))) < 2e-4

def test_fast_codec_dp_matches_dp_xla():
    """DP x fast_codec (r5): with local batch == 128 (here 256 over 2
    virtual devices) the sharded pass routes each device's codec through
    the Pallas kernels (shard_ot.make_sharded_pass fast branch). Same
    rotation stream and psum'd joint statistics — output must equal the
    DP XLA-codec run to accumulation-order tolerance. Depth 1 keeps the
    interpret-mode kernel cost down (the deeper head/tail wiring is pinned
    by the single-device tests above)."""
    from optimaltextures_tpu.utils import imageio

    def run(fast):
        cfg = OptexConfig(size=32, passes=1, iters=4, seed=5, batch=256,
                          depth=1, num_devices=2, style=["unused"],
                          no_multires=True, fast_codec=fast)
        bank = synthetic_bank(1, seed=1)
        synth = core.Synthesizer(cfg, bank=bank)
        key = jax.random.key(0)
        noise = jax.random.uniform(key, (256, 32, 32, 3), jnp.float32)
        style = [np.asarray(jax.random.uniform(
            jax.random.fold_in(key, 1), (1, 32, 32, 3), jnp.float32))]
        # the DP gate must actually see the fast path (not silently fall
        # back): pin the decision itself as well as the output
        assert synth._dp_fast_codec(256, [(32, 32)]) == fast or not fast
        return np.asarray(synth.run(noise, style, key=jax.random.key(9)))

    ref = run(False)
    got = run(True)
    assert ref.shape == got.shape
    err = np.max(np.abs(ref - got))
    assert err < 5e-4, err
    assert err > 0.0  # a zero diff would mean the gate fell back to XLA

def test_fast_codec_chunked_matches_chunked_xla():
    """batch_chunk x fast_codec (r5): with chunk size == 128 (batch 256,
    batch_chunk 128) run() routes each lax.map chunk through the Pallas
    kernels (_pass_stages_chunked_impl fast branch) — batch_chunk becomes
    a throughput path. Same joint statistics over the full batch, same
    rotation stream — output must equal the XLA chunked run to
    accumulation-order tolerance."""
    def run(fast):
        cfg = OptexConfig(size=32, passes=1, iters=4, seed=5, batch=256,
                          depth=1, batch_chunk=128, style=["unused"],
                          no_multires=True, fast_codec=fast)
        bank = synthetic_bank(1, seed=1)
        synth = core.Synthesizer(cfg, bank=bank)
        key = jax.random.key(0)
        noise = jax.random.uniform(key, (256, 32, 32, 3), jnp.float32)
        style = [np.asarray(jax.random.uniform(
            jax.random.fold_in(key, 1), (1, 32, 32, 3), jnp.float32))]
        return np.asarray(synth.run(noise, style, key=jax.random.key(9)))

    ref = run(False)
    got = run(True)
    assert ref.shape == got.shape
    err = np.max(np.abs(ref - got))
    assert err < 5e-4, err
    assert err > 0.0  # a zero diff would mean the gate fell back to XLA

def test_fast_codec_dp_chunked_matches_dp_chunked_xla():
    """DP x batch_chunk x fast_codec (r5): local shard 256 over 2 virtual
    devices, batch_chunk 128 -> each device lax.maps two 128-lane chunks
    through the Pallas kernels while the joint covariance psums over the
    mesh (shard_ot.make_sharded_pass chunked fast branch). Must equal the
    DP x batch_chunk XLA run to accumulation-order tolerance."""
    def run(fast):
        cfg = OptexConfig(size=32, passes=1, iters=2, seed=5, batch=512,
                          depth=1, num_devices=2, batch_chunk=128,
                          style=["unused"], no_multires=True,
                          fast_codec=fast)
        bank = synthetic_bank(1, seed=1)
        synth = core.Synthesizer(cfg, bank=bank)
        key = jax.random.key(0)
        noise = jax.random.uniform(key, (512, 32, 32, 3), jnp.float32)
        style = [np.asarray(jax.random.uniform(
            jax.random.fold_in(key, 1), (1, 32, 32, 3), jnp.float32))]
        assert synth._dp_chunks(512, False) == 2
        assert synth._dp_fast_codec(512, [(32, 32)], n_chunks=2) == fast \
            or not fast
        return np.asarray(synth.run(noise, style, key=jax.random.key(9)))

    ref = run(False)
    got = run(True)
    assert ref.shape == got.shape
    err = np.max(np.abs(ref - got))
    assert err < 5e-4, err
    assert err > 0.0  # a zero diff would mean the gate fell back to XLA
