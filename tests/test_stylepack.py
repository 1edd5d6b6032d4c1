"""Style packs: on-disk persistence of finished style targets (the serving
warm-start checkpoint, utils/stylepack.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.utils import imageio
from optimaltextures_tpu.utils.stylepack import (export_style_pack,
                                                 import_style_pack)

STYLE = "/root/reference/style/graffiti.jpg"


def _cfg(**kw):
    base = dict(size=64, passes=2, iters=8, depth=2, seed=9, style=[STYLE])
    base.update(kw)
    return OptexConfig(**base)


@pytest.mark.parametrize("extra", [
    dict(),                          # chol + PCA
    dict(hist_mode="cdf"),           # samples ride in the pack
    dict(pca_bucket=16),             # bucketed widths + k-masks
])
def test_style_pack_roundtrip(tmp_path, monkeypatch, extra, rng):
    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    noise = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

    donor = core.Synthesizer(_cfg(**extra))
    a = np.asarray(donor.run(noise, styles, styles_token="t"))
    path = export_style_pack(donor, "t", str(tmp_path / "pack.npz"))

    fresh = core.Synthesizer(_cfg(**extra))
    n = import_style_pack(fresh, "t", path)
    assert n >= 1

    calls = []
    orig = core.Synthesizer._dispatch_style_prep
    monkeypatch.setattr(core.Synthesizer, "_dispatch_style_prep",
                        lambda self, *args: calls.append(1) or orig(self, *args))
    b = np.asarray(fresh.run(noise, styles, styles_token="t"))
    assert calls == []            # zero style prep work after import
    np.testing.assert_array_equal(a, b)


def test_pack_stale_token_entries_stay_separate(tmp_path, rng):
    """A token stale-reused for DIFFERENT styles produces cache entries
    under distinct fingerprints; export/import must keep them separate
    (per-entry fingerprints) so a post-import run with the FIRST style
    still gets the first style's statistics (review r3)."""
    style_a = [imageio.load_image(STYLE, 64, oversize=False)]
    style_b = [imageio.load_image("/root/reference/style/zebra.jpg", 64,
                                  oversize=False)]
    noise = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

    donor = core.Synthesizer(_cfg())
    a = np.asarray(donor.run(noise, style_a, styles_token="t"))
    donor.run(noise, style_b, styles_token="t")   # stale reuse, new fp
    path = export_style_pack(donor, "t", str(tmp_path / "pack.npz"))

    fresh = core.Synthesizer(_cfg())
    import_style_pack(fresh, "t", path)
    a2 = np.asarray(fresh.run(noise, style_a, styles_token="t"))
    np.testing.assert_array_equal(a, a2)


def test_style_pack_guards(tmp_path, rng):
    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    noise = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    donor = core.Synthesizer(_cfg())
    with pytest.raises(ValueError, match="no finished"):
        export_style_pack(donor, "t", str(tmp_path / "x.npz"))
    donor.run(noise, styles, styles_token="t")
    path = export_style_pack(donor, "t", str(tmp_path / "x.npz"))

    other = core.Synthesizer(_cfg(hist_mode="sym"))
    with pytest.raises(ValueError, match="signature"):
        import_style_pack(other, "t", path)
