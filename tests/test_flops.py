"""The analytic FLOP model (utils/flops.py) that backs bench.py's MFU figure:
exact on closed-form cases, sane on a real Synthesizer."""

import numpy as np

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.models import arch
from optimaltextures_tpu.utils import flops

STYLE = "/root/reference/style/graffiti.jpg"


def test_conv_stack_flops_closed_form():
    # depth-1 encoder at 64x64: 1x1 conv 3->3 then 3x3 conv 3->64
    got = flops.conv_stack_flops(arch.encoder_specs(1), 64, 64)
    want = 2 * 64 * 64 * (1 * 1 * 3 * 3 + 3 * 3 * 3 * 64)
    assert got == want


def test_conv_stack_flops_tracks_pool_and_up():
    # depth-2 encoder pools once before its last conv
    got = flops.conv_stack_flops(arch.encoder_specs(2), 64, 64)
    want = flops.conv_stack_flops(arch.encoder_specs(1), 64, 64)
    want += 2 * 64 * 64 * (3 * 3 * 64 * 64)            # conv1_2 at full res
    want += 2 * 32 * 32 * (3 * 3 * 64 * 128)           # conv2_1 after pool
    assert got == want
    # decoder-2 upsamples between its convs
    dec = flops.conv_stack_flops(arch.decoder_specs(2), 32, 32)
    want = 2 * 32 * 32 * (3 * 3 * 128 * 64) + 2 * 64 * 64 * (3 * 3 * 64 * 64) \
        + 2 * 64 * 64 * (3 * 3 * 64 * 3)
    assert dec == want


def test_run_flops_matches_run_and_is_sane():
    from optimaltextures_tpu.utils import imageio

    style = imageio.load_image(STYLE, 64, oversize=False)
    cfg = OptexConfig(size=64, passes=2, iters=8, depth=2, seed=0,
                      style=[STYLE])
    synth = core.Synthesizer(cfg)
    out, _ = core.synthesize(cfg, [style])
    # synthesize builds its own Synthesizer; recompute ks on ours
    synth.run(np.asarray(out), [style])
    total = flops.run_flops(synth, (64, 64), [style.shape[1:3]],
                            synth.last_run_ks)
    assert total > 0
    # conv work of the stages alone is a strict lower bound
    conv_only = 0.0
    for p in range(cfg.passes):
        s = synth.sizes[p]
        for d in synth.layer_depths:
            conv_only += flops.conv_stack_flops(arch.encoder_specs(d), s, s)
    assert total > conv_only
    # and the model stays within a plausible envelope (not absurdly large)
    assert total < 1e13
