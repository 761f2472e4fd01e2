"""Bloom + cuckoo seen-filter tests (north-rule components)."""

from __future__ import annotations

import numpy as np
import pytest

from linkkchecker_net_spark.engine.filters import (
    BloomFilter,
    CuckooFilter,
    build_bloom,
    build_partitioned_filters,
    load_partitioned_filters,
)


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_bloom_no_false_negatives():
    keys = _keys(10_000)
    bf = BloomFilter(len(keys), fp_rate=0.01)
    bf.add(keys)
    assert bf.contains(keys).all(), "bloom must never false-negative"


def test_bloom_fp_rate_bounded():
    keys = _keys(10_000)
    bf = BloomFilter(len(keys), fp_rate=0.01)
    bf.add(keys)
    other = _keys(100_000, seed=1)
    fp = bf.contains(other).mean()
    assert fp < 0.03, f"false-positive rate {fp:.4f} too high"


def test_bloom_roundtrip():
    keys = _keys(1000)
    bf = BloomFilter(len(keys))
    bf.add(keys)
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.contains(keys).all()
    assert (bf2.bits == bf.bits).all()


def test_cuckoo_membership_and_delete():
    keys = _keys(5_000)
    cf = CuckooFilter(len(keys) * 2)
    assert cf.add(keys) == len(keys)
    assert cf.contains(keys).all(), "cuckoo must never false-negative"
    other = _keys(50_000, seed=2)
    fp = cf.contains(other).mean()
    assert fp < 0.01, f"cuckoo fp rate {fp:.4f} too high for 16-bit fingerprints"
    # delete support (bloom can't do this)
    half = keys[: len(keys) // 2]
    assert cf.delete(half) == len(half)
    assert not cf.contains(half).all()
    assert cf.contains(keys[len(keys) // 2 :]).all()


def test_cuckoo_roundtrip():
    keys = _keys(1000)
    cf = CuckooFilter(4000)
    cf.add(keys)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains(keys).all()
    assert cf2.count == cf.count


@pytest.mark.usefixtures("spark")
def test_spark_builders(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame({"url_hash": _keys(20_000)})
    df = spark.createDataFrame(pdf)

    blob = build_bloom(df, capacity_hint=20_000)
    bf = BloomFilter.from_bytes(blob)
    assert bf.contains(pdf["url_hash"].to_numpy()).all()

    meta = build_partitioned_filters(df, str(tmp_path / "filters"), partitions=4)
    assert set(meta) == {0, 1, 2, 3}
    filters = load_partitioned_filters(str(tmp_path / "filters"))
    keys = pdf["url_hash"].to_numpy()
    parts = np.mod(keys, 4)  # pmod semantics for negatives
    parts = np.where(parts < 0, parts + 4, parts)
    for p in range(4):
        sub = keys[parts == p]
        assert filters[p].contains(sub).all()
