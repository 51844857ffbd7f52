"""Unit tests for the mergeable sketches (functions/sketches.py):
estimator accuracy, merge/partitioning invariance, and the count-min
overestimate bound."""

import pyarrow as pa
import pytest
import ray.data as rd

from crawl4ai_custom_ray.functions.sketches import (
    cms_estimate,
    hll_distinct,
    _cms_col,
    _hll_rank,
    _md5_u64,
)


def _one_row(ds):
    rows = ds.take_all()
    assert len(rows) == 1
    return rows[0]


def test_hll_rank_definition():
    # rank = 1 + leading-zero count of the 56-bit remainder
    assert _hll_rank(0xFF) == 57  # remainder zero
    assert _hll_rank(1 << 63) == 1  # top bit set → bit_length 56
    assert _hll_rank(1 << 8) == 56  # remainder == 1


def test_hll_estimate_accuracy(ray_session):
    n = 5000
    ds = rd.from_arrow(
        pa.table({"v": [f"url-{i}" for i in range(n)]})
    ).repartition(8)
    row = _one_row(hll_distinct(ds, column="v"))
    assert row["m"] == 256
    # raw HLL with m=256 ≈ 6.5% relative error; allow 4σ
    assert abs(row["estimate"] - n) < 0.26 * n


def test_hll_duplication_and_partitioning_invariant(ray_session):
    vals = [f"u{i}" for i in range(800)]
    a = rd.from_arrow(pa.table({"v": vals})).repartition(2)
    b = rd.from_arrow(pa.table({"v": vals * 3})).repartition(13)
    ra, rb = _one_row(hll_distinct(a, column="v")), _one_row(hll_distinct(b, column="v"))
    assert ra == rb  # set semantics: duplicates and layout don't matter


def test_cms_overestimates_never_under(ray_session):
    keys = [i % 37 for i in range(3000)]
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(6)
    true = {k: keys.count(k) for k in set(keys)}
    probes = rd.from_arrow(pa.table({"k": sorted(true)}))
    out = cms_estimate(ds, probes, column="k").take_all()
    assert len(out) == len(true)
    for row in out:
        t = true[row["k"]]
        assert row["est_count"] >= t
        # total mass bound: an estimate can never exceed N
        assert row["est_count"] <= len(keys)


def test_cms_cell_hash_matches_sql_convention():
    # md5('2|42') % 512, the exact expression the oracle uses
    assert _cms_col(2, "42", 512) == _md5_u64("2|42") % 512
