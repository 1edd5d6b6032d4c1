"""Pallas TPU kernels for the relu1-scale codec section (the throughput wall).

The d5 batch-128 trace (docs/PERF.md r5) decodes to: Cout=64 convs at
~63 TF/s (the conv is an (M=Cout, K=9*Cin, N=batch) contraction and M=64
half-fills the MXU's 128 rows) and the 64->3 decoder-final convs at ~6 TF/s
— together 48% of conv time. XLA-level stride-packing is a wash (the
padding-FLOP tax cancels the MXU gain, tools/convpack_bench.py); these
kernels do the 2-pixel output packing WITHOUT the tax, measured at
134.5 TF/s on the bare conv (tools/pallas_conv_proto.py).

Layout: all kernels run on "TCB" tensors (H, W, C, B) — channels in
sublanes, batch in lanes, B == 128 exactly (the throughput point of
record; other batches use the XLA path). The per-pair contraction is

    out[(s*64+co), b] = sum_r dot(Wrow[r] (128, 4*Cin),
                                  x[h+r-1, 2p-1:2p+3, :, :] (4*Cin, 128))

— M=128 (two output pixels' channels), K=4*Cin, N=128(batch): full MXU
tiles at 75% useful density (vs 50% M-occupancy for the XLA conv).

Kernels (replacing /root/reference/vgg.py:14-135's relu1-scale modules):
  conv3x3_p2    — 3x3 Cin=Cout=64 conv + bias (+relu) (+fused 2x2 maxpool):
                  the encoder conv1_2 (+pool when encoding deeper)
  upconv_p2     — nearest-x2-up + 3x3 64->64 + bias + relu, FOLDED to
                  per-phase 2x2-tap dots on the coarse tensor (the 4x
                  upsampled buffer never exists; 2.25x fewer FLOPs)
  final_to_rgb  — 3x3 64->3 decoder-final conv with the encoder's 1x1 RGB
                  renorm conv folded in (both linear, no relu between:
                  vgg.py:130-134 + vgg.py:16); RGB rides as (H, W, 8, B)
                  f32 with channels 0..2 live
  rgb_to_relu1  — 3x3 3->64 encoder-entry conv + bias + relu from the
                  padded-RGB representation

Halos are DMA'd from the UNPADDED input in HBM (one rectangle per tile,
nine statically-shaped edge variants) and the 1-px reflect/edge border is
repaired with in-VMEM row/col copies — no XLA-side pad materialization.
Double-buffered across the sequential grid. Reflect padding only (the
reference's semantics); tileable wrap runs stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # batch lives in lanes: kernels require B == LANES


# --------------------------------------------------------------------------
# layout + weight transforms (traced XLA ops on tiny arrays)
# --------------------------------------------------------------------------

def nhwc_to_tcb(x):
    """(B, H, W, C) -> (H, W, C, B)."""
    return jnp.transpose(x, (1, 2, 3, 0))


def tcb_to_nhwc(x):
    """(H, W, C, B) -> (B, H, W, C)."""
    return jnp.transpose(x, (3, 0, 1, 2))


def pack_conv_p2(w, b):
    """(3,3,Cin,Co) HWIO + (Co,) -> Wrow (3, 2*Co, 4*Cin), bias (2*Co, 1).

    Wrow[r, s*Co+co, c*Cin+ci] = w[r, c-s, ci, co] for phases s in {0,1},
    window cols c in 0..3 (zero where c-s is outside 0..2).
    """
    kh, kw, cin, co = w.shape
    wr = jnp.zeros((kh, 2 * co, 4 * cin), w.dtype)
    wt = jnp.transpose(w, (0, 1, 3, 2))                # (3, 3, Co, Cin)
    for s in (0, 1):
        for c in range(4):
            if 0 <= c - s <= 2:
                wr = wr.at[:, s * co:(s + 1) * co,
                           c * cin:(c + 1) * cin].set(wt[:, c - s])
    b2 = jnp.concatenate([b, b]).astype(jnp.float32).reshape(2 * co, 1)
    return wr, b2


def pack_upconv_fold(w, b):
    """(3,3,C,Co) + (Co,) -> (wa0, wa1) each (2, 2*Co, 3*C), bias (2*Co, 1).

    nearest-x2-up + reflect-pad + 3x3 conv == per-phase folded taps on the
    coarse tensor with EDGE padding (a fine-scale reflection of a nearest-
    upsampled image is coarse-scale replication). Row phase a=0 (fine row
    2i) combines coarse rows (i-1, i) with row weights (W0, W1+W2); a=1
    combines (i, i+1) with (W0+W1, W2). Col phases ride the packed output
    dim over a shared 3-wide coarse col window (local slots 0..2): b=0 uses
    slots (0, 1) with (V0, V1+V2); b=1 uses (1, 2) with (V0+V1, V2).
    """
    co, cin = w.shape[3], w.shape[2]
    wt = jnp.transpose(w, (0, 1, 3, 2))                # (3, 3, Co, Cin)

    def rows(a):
        if a == 0:
            return jnp.stack([wt[0], wt[1] + wt[2]])   # (2, 3, Co, Cin)
        return jnp.stack([wt[0] + wt[1], wt[2]])

    def cols(rw):
        out = jnp.zeros((2, 2 * co, 3 * cin), w.dtype)
        out = out.at[:, :co, 0 * cin:1 * cin].set(rw[:, 0])
        out = out.at[:, :co, 1 * cin:2 * cin].set(rw[:, 1] + rw[:, 2])
        out = out.at[:, co:, 1 * cin:2 * cin].set(rw[:, 0] + rw[:, 1])
        out = out.at[:, co:, 2 * cin:3 * cin].set(rw[:, 2])
        return out

    b2 = jnp.concatenate([b, b]).astype(jnp.float32).reshape(2 * co, 1)
    return cols(rows(0)), cols(rows(1)), b2


RGB_PAD = 8        # RGB rides as 8 channels (f32 min sublane tile), 3 live
_RGB_GROUP = 16    # final conv packs 16 output pixels into M = 16*8 = 128


def pack_final_rgb(w_fin, b_fin, w_renorm, b_renorm):
    """Fold the encoder's 1x1 RGB renorm conv (vgg.py:16) into the decoder
    final conv (vgg.py:130-134) — both linear, nothing between them in the
    stage roundtrip — then pack 16 output pixels into M=128.

    Returns W3 (3, 128, 18*64) with W3[r, px*8+co, c*64+ci] =
    wf[r, c-px, ci, co] (co < 3), and bias (128, 1).
    """
    # combined: y = renorm(final(x)) -> w[r,c,ci,k] @ renorm[k,co]
    rn = w_renorm[0, 0]                                  # (3, 3) in->out
    wf = jnp.einsum("rcik,ko->rcio", w_fin, rn)
    bf = b_renorm + b_fin @ rn
    kh = 3
    w3 = jnp.zeros((kh, _RGB_GROUP * RGB_PAD, (_RGB_GROUP + 2) * 64),
                   w_fin.dtype)
    wt = jnp.transpose(wf, (0, 1, 3, 2))                 # (3, 3, 3, 64)
    for px in range(_RGB_GROUP):
        for c in range(px, px + 3):
            w3 = w3.at[:, px * RGB_PAD:px * RGB_PAD + 3,
                       c * 64:(c + 1) * 64].set(wt[:, c - px])
    b3 = jnp.zeros((_RGB_GROUP * RGB_PAD,), jnp.float32)
    for px in range(_RGB_GROUP):
        b3 = b3.at[px * RGB_PAD:px * RGB_PAD + 3].set(bf.astype(jnp.float32))
    return w3, b3.reshape(-1, 1)


def pack_entry_rgb(w_ent, b_ent):
    """(3,3,3,64) + (64,) -> We (3, 128, 4*RGB_PAD), bias (128, 1) for the
    2-pixel-packed entry conv consuming the padded-RGB representation
    (kernel K rows for pad channels 3..7 are zero)."""
    co = 64
    we = jnp.zeros((3, 2 * co, 4 * RGB_PAD), w_ent.dtype)
    wt = jnp.transpose(w_ent, (0, 1, 3, 2))              # (3, 3, 64, 3)
    for s in (0, 1):
        for c in range(4):
            if 0 <= c - s <= 2:
                we = we.at[:, s * co:(s + 1) * co,
                           c * RGB_PAD:c * RGB_PAD + 3].set(wt[:, c - s])
    b2 = jnp.concatenate([b_ent, b_ent]).astype(jnp.float32).reshape(-1, 1)
    return we, b2


# --------------------------------------------------------------------------
# halo fill machinery
# --------------------------------------------------------------------------

def _edge_variants(idx, n_tiles, tile, total):
    """Three statically-shaped DMA variants for one spatial axis: (traced
    condition, src start, dst start, static length). The 1-px halo outside
    the array is NOT transferred — it is repaired in VMEM after the wait."""
    return [
        ((idx == 0) & (idx != n_tiles - 1), 0, 1, tile + 1),
        ((idx != 0) & (idx == n_tiles - 1), total - tile - 1, 0, tile + 1),
        ((idx != 0) & (idx != n_tiles - 1), idx * tile - 1, 0, tile + 2),
    ]


def _fill_op(x_hbm, buf, sem, tt, slot, th, tw, n_h, n_w, hh, ww, action):
    """Start or wait the halo-tile DMA for tile index tt into buf[slot].
    Nine statically-shaped variants (interior/top/bottom x left/right);
    start and wait reconstruct the identical descriptor from tt."""
    i, j = tt // n_w, tt % n_w
    for rcond, rs, rd, rn in _edge_variants(i, n_h, th, hh):
        for ccond, cs, cd, cn in _edge_variants(j, n_w, tw, ww):
            @pl.when(rcond & ccond)
            def _(rs=rs, rd=rd, rn=rn, cs=cs, cd=cd, cn=cn):
                d = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(rs, rn), pl.ds(cs, cn)],
                    buf.at[slot, pl.ds(rd, rn), pl.ds(cd, cn)],
                    sem.at[slot])
                if action == "start":
                    d.start()
                else:
                    d.wait()


def _repair(buf, slot, i, j, th, tw, n_h, n_w, mode):
    """Fill the 1-px out-of-range halo from in-VMEM neighbours: reflect
    copies index 2 (x[1]), edge copies index 1 (x[0]). Cols first so the
    row copies carry repaired corners."""
    src = 2 if mode == "reflect" else 1

    @pl.when(j == 0)
    def _():
        buf[slot, :, 0] = buf[slot, :, src]

    @pl.when(j == n_w - 1)
    def _():
        buf[slot, :, tw + 1] = buf[slot, :, tw + 1 - src]

    @pl.when(i == 0)
    def _():
        buf[slot, 0] = buf[slot, src]

    @pl.when(i == n_h - 1)
    def _():
        buf[slot, th + 1] = buf[slot, th + 1 - src]


def _pipeline(x_hbm, buf, sem, t, n_t, th, tw, n_h, n_w, hh, ww, mode):
    """Standard double-buffered fill: start tile 0 at t==0, prefetch t+1,
    wait tile t, repair its halo; returns the ready slot index."""
    fill = functools.partial(_fill_op, x_hbm, buf, sem,
                             th=th, tw=tw, n_h=n_h, n_w=n_w, hh=hh, ww=ww)

    @pl.when(t == 0)
    def _():
        fill(0, 0, action="start")

    @pl.when(t + 1 < n_t)
    def _():
        fill(t + 1, (t + 1) % 2, action="start")

    fill(t, t % 2, action="wait")
    slot = t % 2
    _repair(buf, slot, t // n_w, t % n_w, th, tw, n_h, n_w, mode)
    return slot


# --------------------------------------------------------------------------
# K1: 3x3 Cin=Cout=64 conv (+relu) (+fused 2x2 maxpool)
# --------------------------------------------------------------------------

def _conv_p2_kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, sem, *,
                    th, tw, n_h, n_w, hh, ww, relu, pool, cin):
    t = pl.program_id(0)
    slot = _pipeline(x_hbm, xbuf, sem, t, pl.num_programs(0),
                     th, tw, n_h, n_w, hh, ww, "reflect")
    buf = xbuf.at[slot]
    w0, w1, w2 = w_ref[0], w_ref[1], w_ref[2]
    bias = b_ref[:]
    kdim = 4 * cin

    def pair_acc(h, p):
        p0 = buf[h + 0, pl.ds(2 * p, 4)].reshape(kdim, LANES)
        p1 = buf[h + 1, pl.ds(2 * p, 4)].reshape(kdim, LANES)
        p2 = buf[h + 2, pl.ds(2 * p, 4)].reshape(kdim, LANES)
        acc = jnp.dot(w0, p0, preferred_element_type=jnp.float32)
        acc += jnp.dot(w1, p1, preferred_element_type=jnp.float32)
        acc += jnp.dot(w2, p2, preferred_element_type=jnp.float32)
        acc += bias
        if relu:
            acc = jnp.maximum(acc, 0.0)
        return acc

    if not pool:
        for h in range(th):
            for p in range(tw // 2):
                y = pair_acc(h, p).astype(o_ref.dtype)
                o_ref[h, pl.ds(2 * p, 2)] = y.reshape(2, 64, LANES)
    else:
        # fuse the encoder's 2x2 max-pool: row pairs reduce in registers
        for hp in range(th // 2):
            for p in range(tw // 2):
                ya = pair_acc(2 * hp, p)
                yb = pair_acc(2 * hp + 1, p)
                m = jnp.maximum(ya, yb)                    # (128, 128)
                m = jnp.maximum(m[:64], m[64:])            # (64, 128)
                o_ref[hp, p] = m.astype(o_ref.dtype)


def conv3x3_p2(x, wrow, bias2, relu=True, pool=False, th=8, tw=None,
               interpret=False):
    """x (H, W, Cin, 128) TCB -> relu(conv3x3(x)) at Cout=64 [pooled to
    (H/2, W/2)]. Cin in {64, 128} (the encoder conv1_2 / the decoder
    128->64 conv). wrow/bias2 from :func:`pack_conv_p2`."""
    hh, ww, c, b = x.shape
    cin = wrow.shape[2] // 4
    if tw is None:
        tw = 16 if cin <= 64 else 8   # VMEM: 2x(th+2, tw+2, cin, 128) bf16
    assert b == LANES and c == cin and hh % th == 0 and ww % tw == 0
    n_h, n_w = hh // th, ww // tw
    assert n_h >= 2 and n_w >= 2
    kern = functools.partial(_conv_p2_kernel, th=th, tw=tw, n_h=n_h,
                             n_w=n_w, hh=hh, ww=ww, relu=relu, pool=pool,
                             cin=cin)
    if pool:
        out_shape = jax.ShapeDtypeStruct((hh // 2, ww // 2, 64, b), x.dtype)
        out_spec = pl.BlockSpec((th // 2, tw // 2, 64, b),
                                lambda t: (t // n_w, t % n_w, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((hh, ww, 64, b), x.dtype)
        out_spec = pl.BlockSpec((th, tw, 64, b),
                                lambda t: (t // n_w, t % n_w, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n_h * n_w,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(wrow.shape, lambda t: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias2.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 2, cin, b), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, wrow, bias2)


# --------------------------------------------------------------------------
# K1b: full-width 3x3 conv, Cout=128 (M fills the MXU natively — no
# pixel packing needed): the encoder 64->128 and 128->128 convs
# --------------------------------------------------------------------------

def pack_conv_full(w, b):
    """(3,3,Cin,Co) HWIO + (Co,) -> Wrow (3, Co, 3*Cin), bias (Co, 1) for
    the unpacked per-pixel contraction (Cout >= 128 fills M natively)."""
    kh, kw, cin, co = w.shape
    wr = jnp.transpose(w, (0, 3, 1, 2)).reshape(kh, co, kw * cin)
    return wr, b.astype(jnp.float32).reshape(co, 1)


def _conv_full_kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, sem, *,
                      th, tw, n_h, n_w, hh, ww, relu, pool, cin, cout):
    t = pl.program_id(0)
    slot = _pipeline(x_hbm, xbuf, sem, t, pl.num_programs(0),
                     th, tw, n_h, n_w, hh, ww, "reflect")
    buf = xbuf.at[slot]
    w0, w1, w2 = w_ref[0], w_ref[1], w_ref[2]
    bias = b_ref[:]
    kdim = 3 * cin

    def px_acc(h, p):
        p0 = buf[h + 0, pl.ds(p, 3)].reshape(kdim, LANES)
        p1 = buf[h + 1, pl.ds(p, 3)].reshape(kdim, LANES)
        p2 = buf[h + 2, pl.ds(p, 3)].reshape(kdim, LANES)
        acc = jnp.dot(w0, p0, preferred_element_type=jnp.float32)
        acc += jnp.dot(w1, p1, preferred_element_type=jnp.float32)
        acc += jnp.dot(w2, p2, preferred_element_type=jnp.float32)
        acc += bias
        if relu:
            acc = jnp.maximum(acc, 0.0)
        return acc

    if not pool:
        for h in range(th):
            for p in range(tw):
                o_ref[h, p] = px_acc(h, p).astype(o_ref.dtype)
    else:
        for hp in range(th // 2):
            for pp in range(tw // 2):
                m = jnp.maximum(px_acc(2 * hp, 2 * pp),
                                px_acc(2 * hp, 2 * pp + 1))
                m = jnp.maximum(m, px_acc(2 * hp + 1, 2 * pp))
                m = jnp.maximum(m, px_acc(2 * hp + 1, 2 * pp + 1))
                o_ref[hp, pp] = m.astype(o_ref.dtype)


def conv3x3_full(x, wrow, bias, relu=True, pool=False, th=8, tw=8,
                 interpret=False):
    """x (H, W, Cin, 128) TCB -> relu(conv3x3(x)) at Cout=wrow.shape[1]
    [pooled to (H/2, W/2)]. For Cout >= 128 (no packing: M full)."""
    hh, ww, c, b = x.shape
    cout = wrow.shape[1]
    cin = wrow.shape[2] // 3
    assert b == LANES and c == cin and hh % th == 0 and ww % tw == 0
    n_h, n_w = hh // th, ww // tw
    assert n_h >= 2 and n_w >= 2
    kern = functools.partial(_conv_full_kernel, th=th, tw=tw, n_h=n_h,
                             n_w=n_w, hh=hh, ww=ww, relu=relu, pool=pool,
                             cin=cin, cout=cout)
    if pool:
        out_shape = jax.ShapeDtypeStruct((hh // 2, ww // 2, cout, b),
                                         x.dtype)
        out_spec = pl.BlockSpec((th // 2, tw // 2, cout, b),
                                lambda t: (t // n_w, t % n_w, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((hh, ww, cout, b), x.dtype)
        out_spec = pl.BlockSpec((th, tw, cout, b),
                                lambda t: (t // n_w, t % n_w, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n_h * n_w,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(wrow.shape, lambda t: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 2, cin, b), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, wrow, bias)


# --------------------------------------------------------------------------
# K2: folded nearest-up + 3x3 64->64 + relu (coarse in, fine out)
# --------------------------------------------------------------------------

def _upconv_kernel(x_hbm, wa0_ref, wa1_ref, b_ref, o_ref, cbuf, sem, *,
                   th, tw, n_h, n_w, hh2, ww2, cc):
    t = pl.program_id(0)
    thc, twc = th // 2, tw // 2
    slot = _pipeline(x_hbm, cbuf, sem, t, pl.num_programs(0),
                     thc, twc, n_h, n_w, hh2, ww2, "edge")
    buf = cbuf.at[slot]
    bias = b_ref[:]
    wa = [(wa0_ref[0], wa0_ref[1]), (wa1_ref[0], wa1_ref[1])]
    kdim = 3 * cc

    for h in range(th):
        a = h % 2
        lr = h // 2 + a           # first coarse local row for this phase
        w_r0, w_r1 = wa[a]
        for p in range(tw // 2):
            p0 = buf[lr + 0, pl.ds(p, 3)].reshape(kdim, LANES)
            p1 = buf[lr + 1, pl.ds(p, 3)].reshape(kdim, LANES)
            acc = jnp.dot(w_r0, p0, preferred_element_type=jnp.float32)
            acc += jnp.dot(w_r1, p1, preferred_element_type=jnp.float32)
            acc += bias
            y = jnp.maximum(acc, 0.0).astype(o_ref.dtype)
            o_ref[h, pl.ds(2 * p, 2)] = y.reshape(2, cc, LANES)


def upconv_p2(x2, wa0, wa1, bias2, th=8, tw=None, interpret=False):
    """x2 (H/2, W/2, C, 128) coarse TCB -> relu(conv3x3(nearest_up(x2)))
    at (H, W, C, 128), via the folded per-phase taps (the 4x fine buffer
    never exists). C in {64, 128}. Weights from :func:`pack_upconv_fold`."""
    hh2, ww2, c, b = x2.shape
    cc = wa0.shape[1] // 2
    if tw is None:
        tw = 16 if cc <= 64 else 8
    hh, ww = 2 * hh2, 2 * ww2
    assert b == LANES and c == cc and hh % th == 0 and ww % tw == 0
    n_h, n_w = hh // th, ww // tw
    assert n_h >= 2 and n_w >= 2
    kern = functools.partial(_upconv_kernel, th=th, tw=tw, n_h=n_h,
                             n_w=n_w, hh2=hh2, ww2=ww2, cc=cc)
    return pl.pallas_call(
        kern,
        grid=(n_h * n_w,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(wa0.shape, lambda t: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wa1.shape, lambda t: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias2.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw, cc, b),
                               lambda t: (t // n_w, t % n_w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hh, ww, cc, b), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th // 2 + 2, tw // 2 + 2, cc, b), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, wa0, wa1, bias2)


# --------------------------------------------------------------------------
# K3f: decoder final 64->3 (+folded 1x1 RGB renorm) -> padded-RGB f32
# --------------------------------------------------------------------------

def _final_kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, sem, *,
                  th, tw, n_h, n_w, hh, ww):
    t = pl.program_id(0)
    slot = _pipeline(x_hbm, xbuf, sem, t, pl.num_programs(0),
                     th, tw, n_h, n_w, hh, ww, "reflect")
    buf = xbuf.at[slot]
    w0, w1, w2 = w_ref[0], w_ref[1], w_ref[2]
    bias = b_ref[:]
    kdim = (_RGB_GROUP + 2) * 64

    for h in range(th):
        for g in range(tw // _RGB_GROUP):
            c0 = g * _RGB_GROUP
            p0 = buf[h + 0, pl.ds(c0, _RGB_GROUP + 2)].reshape(kdim, LANES)
            p1 = buf[h + 1, pl.ds(c0, _RGB_GROUP + 2)].reshape(kdim, LANES)
            p2 = buf[h + 2, pl.ds(c0, _RGB_GROUP + 2)].reshape(kdim, LANES)
            acc = jnp.dot(w0, p0, preferred_element_type=jnp.float32)
            acc += jnp.dot(w1, p1, preferred_element_type=jnp.float32)
            acc += jnp.dot(w2, p2, preferred_element_type=jnp.float32)
            acc += bias
            o_ref[h, pl.ds(c0, _RGB_GROUP)] = \
                acc.reshape(_RGB_GROUP, RGB_PAD, LANES)


def final_to_rgb(x, w3, b3, th=8, tw=16, interpret=False):
    """x (H, W, 64, 128) -> padded RGB (H, W, 8, 128) f32 (channels 0..2
    live; the encoder 1x1 renorm is folded into w3 — pack_final_rgb)."""
    hh, ww, c, b = x.shape
    assert b == LANES and c == 64 and hh % th == 0 and ww % tw == 0
    assert tw % _RGB_GROUP == 0
    n_h, n_w = hh // th, ww // tw
    assert n_h >= 2 and n_w >= 2
    kern = functools.partial(_final_kernel, th=th, tw=tw, n_h=n_h,
                             n_w=n_w, hh=hh, ww=ww)
    return pl.pallas_call(
        kern,
        grid=(n_h * n_w,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(w3.shape, lambda t: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b3.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw, RGB_PAD, b),
                               lambda t: (t // n_w, t % n_w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hh, ww, RGB_PAD, b), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 2, 64, b), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w3, b3)


# --------------------------------------------------------------------------
# K3e: encoder entry 3->64 + relu from padded-RGB f32
# --------------------------------------------------------------------------

def _entry_kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, sem, *,
                  th, tw, n_h, n_w, hh, ww):
    t = pl.program_id(0)
    slot = _pipeline(x_hbm, xbuf, sem, t, pl.num_programs(0),
                     th, tw, n_h, n_w, hh, ww, "reflect")
    buf = xbuf.at[slot]
    w0, w1, w2 = w_ref[0], w_ref[1], w_ref[2]
    bias = b_ref[:]
    kdim = 4 * RGB_PAD

    for h in range(th):
        for p in range(tw // 2):
            p0 = buf[h + 0, pl.ds(2 * p, 4)].reshape(kdim, LANES)
            p1 = buf[h + 1, pl.ds(2 * p, 4)].reshape(kdim, LANES)
            p2 = buf[h + 2, pl.ds(2 * p, 4)].reshape(kdim, LANES)
            dt = w0.dtype
            acc = jnp.dot(w0, p0.astype(dt),
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(w1, p1.astype(dt),
                           preferred_element_type=jnp.float32)
            acc += jnp.dot(w2, p2.astype(dt),
                           preferred_element_type=jnp.float32)
            acc += bias
            y = jnp.maximum(acc, 0.0).astype(o_ref.dtype)
            o_ref[h, pl.ds(2 * p, 2)] = y.reshape(2, 64, LANES)


def rgb_to_relu1(rgb, we, be, out_dtype=jnp.bfloat16, th=8, tw=16,
                 interpret=False):
    """rgb (H, W, 8, 128) f32 (channels 0..2 live) -> relu1_1 features
    (H, W, 64, 128) out_dtype. Weights from :func:`pack_entry_rgb`."""
    hh, ww, c, b = rgb.shape
    assert b == LANES and c == RGB_PAD and hh % th == 0 and ww % tw == 0
    n_h, n_w = hh // th, ww // tw
    assert n_h >= 2 and n_w >= 2
    kern = functools.partial(_entry_kernel, th=th, tw=tw, n_h=n_h,
                             n_w=n_w, hh=hh, ww=ww)
    return pl.pallas_call(
        kern,
        grid=(n_h * n_w,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(we.shape, lambda t: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(be.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw, 64, b),
                               lambda t: (t // n_w, t % n_w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hh, ww, 64, b), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 2, RGB_PAD, b), rgb.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rgb, we, be)
