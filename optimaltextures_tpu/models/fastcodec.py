"""Pallas-accelerated relu1-scale codec path for the stage roundtrips.

Every OT stage decodes the pastiche to pixels and re-encodes it to the next
layer (optex.py:81-139 keeps the pastiche at pixel level between layers).
On the d5 batch-128 trace the relu1-scale convs of those roundtrips — all
Cout∈{64,3} at full resolution — are ~48% of conv time at 6-63 TF/s (the
MXU runs half-empty; docs/PERF.md r5). This module routes exactly that
section through the 2px-packed kernels in :mod:`..ops.pallas.codec`
(134-140 TF/s measured), leaving everything at 128+ channels on XLA:

  decode_tail:  XLA decoder convs -> transpose at the 256^2 boundary ->
                upconv_p2 -> final_to_rgb (the NEXT stage's 1x1 RGB renorm
                folded in; identity for the pass-final decode)
  encode_head:  rgb_to_relu1 -> conv3x3_p2(+fused pool) -> transpose ->
                XLA encoder convs

Between stages the image lives as a post-renorm padded-RGB (H, W, 8, B)
f32 tensor — the full-res 64-channel feature maps never round-trip HBM in
NHWC, the 4x nearest-up buffer never exists, and the only layout
transposes ride the cheap 256^2-scale or RGB tensors.

Numerics: same ops modulo MXU accumulation order and the folded upconv/
renorm weight sums (~1 ulp of the weights); equality-tested against the
XLA path (tests/test_fastcodec.py). Eligibility is static per trace:
batch == 128 (batch rides the kernels' lane dim), reflect padding, sizes
multiples of 32, and depth covered by the spec tables; the f32 parity path
and all sharded/chunked paths keep the XLA codec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.convops import conv2d_nhwc
from ..ops.pallas import codec
from . import arch
from .vgg import _run_stack


def _interpret() -> bool:
    # compiled Mosaic on TPU; the interpreter elsewhere (CPU equality tests)
    return jax.default_backend() != "tpu"


def eligible(batch: int, sizes, pad_mode: str, conv_dtype) -> bool:
    """Static per-trace gate. ``sizes``: every (h, w) the run visits."""
    if batch != codec.LANES or pad_mode != "reflect":
        return False
    if jnp.dtype(conv_dtype) != jnp.bfloat16 and not _interpret():
        return False
    for (h, w) in sizes:
        if h % 32 or w % 32 or h < 32 or w < 32:
            return False
    return True


def pixels_to_rgb8(renorm_params, pastiche):
    """NHWC pixels (conv dtype) -> post-renorm padded-RGB TCB f32.

    Applies the encoder's 1x1 RGB renorm conv (vgg.py:16) once here; the
    per-stage roundtrips keep the representation post-renorm (decode_tail
    folds the next renorm into the decoder-final conv)."""
    w0, b0 = renorm_params
    y = conv2d_nhwc(pastiche, w0, b0)
    y = jnp.pad(y, ((0, 0),) * 3 + ((0, codec.RGB_PAD - 3),))
    return codec.nhwc_to_tcb(y).astype(jnp.float32)


def rgb8_to_pixels(rgb8, dtype):
    """Padded-RGB TCB f32 (UN-renormed — pass renorm=None to the last
    decode_tail) -> NHWC pixels."""
    return codec.tcb_to_nhwc(rgb8)[..., :3].astype(dtype)


def encode_head(enc_params, depth: int, rgb8, conv_dtype):
    """Post-renorm padded-RGB TCB -> relu{depth}_1 features, NHWC.

    Kernel-covered encoder prefix (arch._ENCODER_FULL indices): [1] entry
    3->64, [2] conv1_2 + [3]'s pre-pool, [3] 64->128, [4] 128->128 +
    [5]'s pre-pool — everything through the 128-channel scale; XLA takes
    over at 256 channels (the MXU is already full there)."""
    ip = _interpret()
    we, be = codec.pack_entry_rgb(*enc_params[1])
    t = codec.rgb_to_relu1(rgb8, we, be, out_dtype=conv_dtype, interpret=ip)
    if depth == 1:
        return codec.tcb_to_nhwc(t)
    wr, b2 = codec.pack_conv_p2(*enc_params[2])
    t = codec.conv3x3_p2(t, wr, b2, relu=True, pool=True, interpret=ip)
    w128, b128 = codec.pack_conv_full(*enc_params[3])
    if depth == 2:
        t = codec.conv3x3_full(t, w128, b128, relu=True, interpret=ip)
        return codec.tcb_to_nhwc(t)
    t = codec.conv3x3_full(t, w128, b128, relu=True, interpret=ip)
    w44, b44 = codec.pack_conv_full(*enc_params[4])
    t = codec.conv3x3_full(t, w44, b44, relu=True, pool=True, interpret=ip)
    x = codec.tcb_to_nhwc(t)
    specs = arch.encoder_specs(depth)[5:]
    # spec[5]'s pre-pool is fused into the 128->128 kernel above
    s0 = specs[0]
    specs = [(s0[0], s0[1], s0[2], "", s0[4])] + list(specs[1:])
    return _run_stack(enc_params[5:], specs, x, "reflect")


def decode_tail(dec_params, depth: int, feat, renorm_params, conv_dtype):
    """relu{depth}_1 features (NHWC) -> post-renorm padded-RGB TCB f32.

    ``renorm_params``: the NEXT stage's encoder 1x1 renorm to fold into the
    decoder-final conv, or None for the pass-final decode (raw pixels)."""
    ip = _interpret()
    feat = feat.astype(conv_dtype)
    if depth == 1:
        x = codec.nhwc_to_tcb(feat)
    else:
        # kernel-covered decoder suffix: [-4] 128->128 upconv, [-3] 128->64,
        # [-2] 64->64 upconv, [-1] final; XLA above 128 channels
        specs = arch.decoder_specs(depth)
        if depth == 2:
            x = codec.nhwc_to_tcb(feat)
        else:
            y = _run_stack(dec_params[:-4], specs[:-4], feat, "reflect")
            x = codec.nhwc_to_tcb(y)
            wa0u, wa1u, buu = codec.pack_upconv_fold(*dec_params[-4])
            x = codec.upconv_p2(x, wa0u, wa1u, buu, interpret=ip)
        wrd, brd = codec.pack_conv_p2(*dec_params[-3])
        x = codec.conv3x3_p2(x, wrd, brd, relu=True, interpret=ip)
        wa0, wa1, bu = codec.pack_upconv_fold(*dec_params[-2])
        x = codec.upconv_p2(x, wa0, wa1, bu, interpret=ip)
    wf, bf = dec_params[-1]
    if renorm_params is None:
        w_rn = jnp.eye(3, dtype=wf.dtype).reshape(1, 1, 3, 3)
        b_rn = jnp.zeros((3,), wf.dtype)
    else:
        w_rn, b_rn = renorm_params
    w3, b3 = codec.pack_final_rgb(wf, bf, w_rn, b_rn)
    return codec.final_to_rgb(x, w3, b3, interpret=ip)
