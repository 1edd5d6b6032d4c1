"""Depth-4/5 architecture validation with synthetic weights: the reference
snapshot lacks conv4/5 checkpoints, but the spec tables and forward passes
must already be correct so dropping in converted weights later just works."""

import numpy as np
import pytest

import jax.numpy as jnp

from optimaltextures_tpu.models import arch
from optimaltextures_tpu.models.vgg import decode, encode, encode_taps


def synth_params(specs, rng):
    return [(jnp.asarray(rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32)),
             jnp.asarray(np.zeros(cout, np.float32)))
            for (cin, cout, k, _, _) in specs]


@pytest.mark.parametrize("depth", [4, 5])
def test_deep_encoder_decoder_shapes(depth, rng):
    img = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    ep = synth_params(arch.encoder_specs(depth), rng)
    dp = synth_params(arch.decoder_specs(depth), rng)
    feat = encode(ep, depth, img)
    s = arch.FEATURE_STRIDE[depth]
    assert feat.shape == (1, 64 // s, 64 // s, arch.FEATURE_CHANNELS[depth])
    out = decode(dp, depth, feat)
    assert out.shape == img.shape


def test_deep_encoder_taps(rng):
    img = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    ep = synth_params(arch.encoder_specs(5), rng)
    taps = encode_taps(ep, 5, img)
    assert [t.shape[-1] for t in taps] == [64, 128, 256, 512, 512]
    assert [t.shape[1] for t in taps] == [64, 32, 16, 8, 4]


def test_depth5_synthetic_end_to_end(rng):
    """The FULL 5-depth pipeline orchestration runs today with the
    FLOP-identical synthetic bank (models.vgg.synthetic_bank): 5-layer
    schedule + PCA at C=512 + content matching. Real conv4/5 weights drop in
    unchanged. Also pins that the two content_anchor rules coincide at
    depth 5 (byte-identical outputs)."""
    from optimaltextures_tpu import core
    from optimaltextures_tpu.config import OptexConfig
    from optimaltextures_tpu.models.vgg import synthetic_bank
    from optimaltextures_tpu.utils import imageio

    bank = synthetic_bank(5)
    style = imageio.load_image("/root/reference/style/graffiti.jpg", 64,
                               oversize=False)
    content = imageio.load_image("/root/reference/content/rocket.jpg", 64,
                                 oversize=False)
    noise = jnp.asarray(rng.random(content.shape, dtype=np.float32))

    outs = {}
    for anchor in ("index", "depth"):
        cfg = OptexConfig(size=64, passes=1, iters=5, no_multires=True,
                          depth=5, seed=0, content_strength=0.4,
                          content_anchor=anchor, style=["graffiti.jpg"])
        synth = core.Synthesizer(cfg, bank=bank)
        assert synth.depth == 5 and len(synth.layer_depths) == 5
        out = np.asarray(synth.run(noise, [style], content))
        assert out.shape == content.shape
        assert np.isfinite(out).all()
        outs[anchor] = out
    np.testing.assert_array_equal(outs["index"], outs["depth"])


def test_conv_counts_match_reference_checkpoint_layout():
    """Sequential indices for depths 4/5 follow the documented key layout
    (so conversion will line up when the .pth files are sourced)."""
    idx5 = arch.torch_sequential_indices(arch.encoder_specs(5))
    # depth-3 prefix must be identical to the verified depth-3 checkpoint keys
    assert idx5[:6] == [0, 2, 5, 9, 12, 16]
    assert len(idx5) == 14
    dec5 = arch.torch_sequential_indices(arch.decoder_specs(5))
    assert len(dec5) == 13
