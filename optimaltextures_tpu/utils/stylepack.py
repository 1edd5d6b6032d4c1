"""Style packs: persist a style's finished transport targets to disk.

The reference's only checkpointing is read-side model weights (SURVEY §5).
A serving deployment has a second warm-start asset: the per-(pass, depth)
style statistics (projected eigvecs + mu/cov/samples + scalar means) that
`Synthesizer.run(styles_token=...)` caches in memory. Exporting them lets a
restarted service skip ALL style conv/eigh device work and the PCA
k-decision sync on its first request — together with the persistent XLA
compilation cache this makes process restarts fully warm.

Format: one ``.npz`` holding a JSON manifest + flat arrays. Packs are tied
to the prep-relevant config signature (depth, hist_mode, pca settings,
size/schedule); importing into a mismatched Synthesizer raises.
"""

from __future__ import annotations

import json
from typing import List

import jax.numpy as jnp
import numpy as np


def _signature(synth) -> List:
    cfg = synth.cfg
    return [synth.depth, cfg.hist_mode, cfg.no_pca, cfg.pca_bucket,
            cfg.pca_traced_k, cfg.style_scale, cfg.size, cfg.passes,
            cfg.no_multires, cfg.compat_schedule_quirk]


def export_style_pack(synth, styles_token, path: str) -> str:
    """Write every finished cache entry for ``styles_token`` to ``path``.

    Cache keys are ``((token, content_fingerprint), ck)`` — run() verifies
    tokens against the style arrays' content (core._styles_fingerprint).
    Each entry's fingerprint rides in the manifest PER ENTRY, so an import
    re-keys it exactly as a fresh run() of the same styles would — entries
    from a stale-reused token (different content, different fingerprint)
    stay separate instead of merging under one fingerprint."""
    entries = [(full, e) for full, e in synth._style_prep_cache.items()
               if full[0][0] == styles_token and e[4] is not None]
    if not entries:
        raise ValueError(
            f"no finished style-prep cache entries for token {styles_token!r}"
            " — run() with styles_token at least once first")

    arrays = {}
    manifest = {"version": 2, "signature": _signature(synth), "entries": []}
    for j, (full, e) in enumerate(entries):
        ck = full[1]
        ent = {"ck": ck, "fingerprint": full[0][1],
               "widths": [int(w) for w in e[1]],
               "n_depths": len(e[4]),
               "has_eigvecs": [], "has_samples": [], "has_kmask": []}
        for i, (eigvecs, stats, mean) in enumerate(e[4]):
            pre = f"e{j}_d{i}_"
            ent["has_eigvecs"].append(eigvecs is not None)
            ent["has_samples"].append(stats.samples is not None)
            ent["has_kmask"].append(e[2][i] is not None)
            if eigvecs is not None:
                arrays[pre + "eigvecs"] = np.asarray(eigvecs)
            arrays[pre + "mu"] = np.asarray(stats.mu)
            arrays[pre + "cov"] = np.asarray(stats.cov_raw)
            if stats.samples is not None:
                arrays[pre + "samples"] = np.asarray(stats.samples)
            arrays[pre + "mean"] = np.asarray(mean)
            if e[2][i] is not None:
                arrays[pre + "kmask"] = np.asarray(e[2][i])
        manifest["entries"].append(ent)

    np.savez(path, manifest=np.asarray(json.dumps(manifest)), **arrays)
    return path


def import_style_pack(synth, styles_token, path: str) -> int:
    """Load a pack into ``synth``'s cross-run cache under ``styles_token``.
    Returns the number of entries restored. Raises on config mismatch."""
    from .. import transport

    z = np.load(path, allow_pickle=False)
    manifest = json.loads(str(z["manifest"]))
    if manifest.get("version") != 2:
        raise ValueError(f"style pack version {manifest.get('version')} "
                         "unsupported (expected 2)")
    if manifest["signature"] != _signature(synth):
        raise ValueError(
            f"style pack signature {manifest['signature']} does not match "
            f"this Synthesizer's {_signature(synth)}")

    for j, ent in enumerate(manifest["entries"]):
        slim, masks = [], []
        for i in range(ent["n_depths"]):
            pre = f"e{j}_d{i}_"
            eigvecs = (jnp.asarray(z[pre + "eigvecs"])
                       if ent["has_eigvecs"][i] else None)
            samples = (jnp.asarray(z[pre + "samples"])
                       if ent["has_samples"][i] else None)
            stats = transport.StyleStats(jnp.asarray(z[pre + "mu"]),
                                         jnp.asarray(z[pre + "cov"]), samples)
            slim.append((eigvecs, stats, jnp.asarray(z[pre + "mean"])))
            masks.append(jnp.asarray(z[pre + "kmask"])
                         if ent["has_kmask"][i] else None)
        ck = ent["ck"]
        full = ((styles_token, ent["fingerprint"]), ck)
        synth._style_prep_cache[full] = [None, tuple(ent["widths"]),
                                         tuple(masks), full, slim]
    return len(manifest["entries"])
