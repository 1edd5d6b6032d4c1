"""TPU smoke drive: encode/decode a real style image on the real chip.

Usage: python tools/tpu_smoke.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from optimaltextures_tpu.models.vgg import VGGBank


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print("devices:", jax.devices(), flush=True)
    img = Image.open("/root/reference/style/graffiti.jpg").convert("RGB").resize((size, size))
    x = jnp.asarray(np.asarray(img, dtype=np.float32)[None] / 255.0)
    bank = VGGBank()
    print("max_depth:", bank.max_depth, flush=True)
    enc = jax.jit(bank.encode_fn(3))
    dec = jax.jit(bank.decode_fn(3))

    t0 = time.time()
    feat = enc(x)
    feat.block_until_ready()
    print(f"encode compile+run: {time.time()-t0:.1f}s feat={feat.shape} "
          f"mean={float(feat.mean()):.4f}", flush=True)
    t0 = time.time()
    out = dec(feat)
    out.block_until_ready()
    print(f"decode compile+run: {time.time()-t0:.1f}s out={out.shape} "
          f"range=[{float(out.min()):.3f},{float(out.max()):.3f}]", flush=True)

    t0 = time.time()
    for _ in range(5):
        out = dec(enc(x))
    out.block_until_ready()
    print(f"steady roundtrip: {(time.time()-t0)/5*1000:.1f} ms/iter", flush=True)

    rec = np.clip(np.asarray(out)[0], 0, 1)
    Image.fromarray((rec * 255).astype(np.uint8)).save("/tmp/roundtrip_relu3.png")
    print("roundtrip mean abs err:", float(jnp.abs(out - x).mean()), flush=True)
    print("saved /tmp/roundtrip_relu3.png", flush=True)

    pallas_ab_check(feat)


def pallas_ab_check(feat) -> None:
    """COMPILED-path correctness of the Pallas cdf kernels on the real chip:
    one cdf transport step with an injected rotation, Pallas vs the XLA
    scatter/gather path, same inputs (r1 VERDICT weak #5 — the CPU suite can
    only interpret-mode test these kernels)."""
    import jax
    import jax.numpy as jnp

    from optimaltextures_tpu import transport
    from optimaltextures_tpu.ops.rotation import random_rotation

    key = jax.random.key(11)
    c = feat.shape[-1]
    target = feat[:, :32, :32, :].astype(jnp.float32)
    style = (jax.random.normal(key, (1, 24, 24, c), jnp.float32) ** 2)
    samples = style.reshape(-1, c)
    rot = random_rotation(jax.random.fold_in(key, 1), c)

    step = jax.jit(transport._sampled_step_with_rot,
                   static_argnames=("mode", "use_pallas"))
    a = step(rot, target, samples, mode="cdf", use_pallas=True)
    b = step(rot, target, samples, mode="cdf", use_pallas=False)
    err = float(jnp.abs(a - b).max())
    assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3), \
        f"Pallas/XLA cdf mismatch: max abs err {err}"
    print(f"pallas cdf A/B OK: max abs err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
