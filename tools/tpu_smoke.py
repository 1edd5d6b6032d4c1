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


if __name__ == "__main__":
    main()
