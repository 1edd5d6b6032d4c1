"""The unified process-capacity-knob latching rule (VERDICT r4 weak #7).

config.py owns three env knobs (OPTEX_SORT_BLOCK_ELEMS,
OPTEX_PREP_PREFETCH_GB, OPTEX_NO_COV_PROP). One rule for all of them:

    test/override module attribute  >  environment variable  >  default

with every environment read happening at CALL/TRACE time — setting a
variable after import takes effect on the next call (the r4 import-time
latch of OPTEX_SORT_BLOCK_ELEMS was the inconsistency, ADVICE r4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optimaltextures_tpu import config, core, transport
from optimaltextures_tpu.ops import histmatch


def test_sort_block_elems_env_read_at_call_time(monkeypatch):
    assert config.sort_block_elems() == config._SORT_BLOCK_ELEMS_DEFAULT
    monkeypatch.setenv("OPTEX_SORT_BLOCK_ELEMS", "4096")
    assert config.sort_block_elems() == 4096  # post-import change applies


def test_prep_prefetch_env_read_at_call_time(monkeypatch):
    assert config.prep_prefetch_bytes() == int(
        config._PREP_PREFETCH_GB_DEFAULT * 2 ** 30)
    monkeypatch.setenv("OPTEX_PREP_PREFETCH_GB", "0.5")
    assert config.prep_prefetch_bytes() == 2 ** 29


def test_cov_prop_env_read_at_call_time(monkeypatch):
    assert transport.cov_propagation_enabled()
    monkeypatch.setenv("OPTEX_NO_COV_PROP", "1")
    assert not transport.cov_propagation_enabled()


def test_attribute_overrides_beat_env(monkeypatch):
    """The test/override hooks win over the environment (precedence pin)."""
    monkeypatch.setenv("OPTEX_SORT_BLOCK_ELEMS", str(10 ** 12))
    monkeypatch.setattr(histmatch, "_SORT_BLOCK_ELEMS", 8)
    # cap=8 forces 1-row blocks on a tiny cloud that the env cap never would
    t = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    s = jnp.asarray(np.arange(12, 0, -1, dtype=np.float32).reshape(3, 4))
    blocked = np.asarray(histmatch.sort_match_rows(t, s))
    monkeypatch.setattr(histmatch, "_SORT_BLOCK_ELEMS", None)
    mono = np.asarray(histmatch.sort_match_rows(t, s))
    np.testing.assert_array_equal(blocked, mono)

    monkeypatch.setenv("OPTEX_PREP_PREFETCH_GB", "1000")
    monkeypatch.setattr(core.Synthesizer, "_PREP_PREFETCH_BYTES", 7)
    synth = core.Synthesizer.__new__(core.Synthesizer)  # no device work
    assert synth._prep_budget_bytes() == 7
    monkeypatch.setattr(core.Synthesizer, "_PREP_PREFETCH_BYTES", None)
    assert synth._prep_budget_bytes() == 1000 * 2 ** 30


def test_sort_blocking_gates_on_source_cloud(monkeypatch):
    """ADVICE r4: with ns >> nt the per-block live buffers are rows*ns —
    the gate and the block sizing must count max(nt, ns), so a big-style /
    small-target pair (c*nt tiny, c*ns huge) takes the blocked path with
    source-bounded rows, bit-identically."""
    calls = []
    real = histmatch._sort_match_rows_impl

    def spy(t, s):
        calls.append((t.shape, s.shape))
        return real(t, s)

    monkeypatch.setattr(histmatch, "_sort_match_rows_impl", spy)
    monkeypatch.setattr(histmatch, "_SORT_BLOCK_ELEMS", 3000)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))   # c*nt=96
    s = jnp.asarray(rng.normal(size=(6, 2048)).astype(np.float32))  # c*ns=12k
    blocked = np.asarray(histmatch.sort_match_rows(t, s))
    # gate fired on the SOURCE cloud: rows = 3000 // 2048 = 1 per block
    assert calls and calls[0][0][0] == 1 and calls[0][1][1] == 2048
    calls.clear()
    monkeypatch.setattr(histmatch, "_SORT_BLOCK_ELEMS", None)
    mono = np.asarray(histmatch.sort_match_rows(t, s))
    assert calls and calls[0][0][0] == 6  # monolithic under the default cap
    np.testing.assert_array_equal(blocked, mono)
