"""Scheduler golden tests — including the reference's [l-1] indexing quirk
(SURVEY §3.1: verified per-pass budgets at defaults)."""

import numpy as np

from optimaltextures_tpu.utils import schedule


def test_default_schedule_golden():
    iters, sizes = schedule.iters_and_sizes(512, 500, 5, True, quirk=True)
    assert sizes == [256, 320, 384, 448, 512]
    # pass-0 budget at defaults, layer-loop order relu5..relu1 (SURVEY §3.1)
    assert iters[0] == [40, 8, 13, 22, 40]
    assert sum(sum(row) for row in iters) == 493  # NOT 500 — int truncation
    assert [sum(row) for row in iters] == [123, 112, 98, 86, 74]


def test_schedule_reference_replication():
    """Re-derive the quirked table directly from the reference formulas."""
    size, total, passes = 512, 500, 5
    per_pass = np.arange(2 * passes, passes, -1, dtype=np.float64)
    per_pass = per_pass / per_pass.sum() * total
    prop = (np.array([64, 128, 256, 512, 512], dtype=np.float64) + 64)
    prop = prop / prop.sum()
    table = (per_pass[:, None] * prop[None, :]).astype(np.int64)
    expected = [[int(table[p][(l - 1) % 5]) for l in range(5)] for p in range(passes)]
    iters, _ = schedule.iters_and_sizes(size, total, passes, True, quirk=True)
    assert iters == expected


def test_schedule_no_quirk_is_monotone_by_depth():
    iters, _ = schedule.iters_and_sizes(512, 500, 5, True, quirk=False)
    for row in iters:
        assert row == sorted(row, reverse=True)  # deepest layer gets most


def test_schedule_no_multires():
    iters, sizes = schedule.iters_and_sizes(512, 500, 5, False, quirk=True)
    assert sizes == [512] * 5
    assert all(sum(row) <= 100 for row in iters)


def test_schedule_truncated_layers_quirk():
    """With 3 layers, loop positions 0..2 read columns (l-1)%5 = 4,0,1 —
    exactly what the reference code would do with a 3-deep encoder bank."""
    full, _ = schedule.iters_and_sizes(512, 500, 5, True, quirk=True, num_layers=5)
    tri, _ = schedule.iters_and_sizes(512, 500, 5, True, quirk=True, num_layers=3)
    assert [row[:3] for row in full] == tri


def test_round32():
    assert schedule.round32(1) == 32
    assert schedule.round32(32) == 32
    assert schedule.round32(33) == 64
    assert schedule.round32(511) == 512


def test_get_size_semantics():
    # oversize=False: first dim is the UNSCALED size (reference quirk)
    assert schedule.get_size(256, 0.5, 512, 384) == (256, 96)
    # oversize=True: scaled then capped at current dims
    assert schedule.get_size(512, 1.0, 300, 400, oversize=True) == (320, 416)
    # cap engages
    assert schedule.get_size(512, 2.0, 300, 400, oversize=True) == (320, 416)
