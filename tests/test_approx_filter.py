from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from darc_spark.operators.approx_filter import BloomFilter, CuckooFilter, load_filter


def _keys(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.int64).view(np.uint64)


def test_bloom_no_false_negatives():
    keys = _keys(5000, 1)
    bf = BloomFilter.for_capacity(5000, fpp=0.01)
    bf.add(keys)
    assert bf.might_contain(keys).all()


def test_bloom_fpp_reasonable():
    keys = _keys(5000, 2)
    other = _keys(20000, 3)
    bf = BloomFilter.for_capacity(5000, fpp=0.01)
    bf.add(keys)
    fp = bf.might_contain(other).mean()
    assert fp < 0.03


def test_bloom_roundtrip_bytes():
    keys = _keys(100, 4)
    bf = BloomFilter.for_capacity(100)
    bf.add(keys)
    bf2 = load_filter(bf.to_bytes())
    assert isinstance(bf2, BloomFilter)
    assert bf2.might_contain(keys).all()


def test_cuckoo_no_false_negatives():
    keys = _keys(3000, 5)
    cf = CuckooFilter.for_capacity(5000)
    assert cf.insert(keys)
    assert cf.might_contain(keys).all()


def test_cuckoo_delete_then_absent():
    keys = _keys(1000, 6)
    cf = CuckooFilter.for_capacity(2000)
    cf.insert(keys)
    deleted = cf.delete(keys[:500])
    assert deleted.all()
    # deleted keys mostly gone (fp collisions possible but rare)
    assert cf.might_contain(keys[:500]).mean() < 0.05
    # remaining keys all still present
    assert cf.might_contain(keys[500:]).all()


def test_cuckoo_fpp_reasonable():
    keys = _keys(3000, 7)
    other = _keys(20000, 8)
    cf = CuckooFilter.for_capacity(5000)
    cf.insert(keys)
    assert cf.might_contain(other).mean() < 0.01


def test_cuckoo_roundtrip_bytes():
    keys = _keys(100, 9)
    cf = CuckooFilter.for_capacity(200)
    cf.insert(keys)
    cf2 = load_filter(cf.to_bytes())
    assert isinstance(cf2, CuckooFilter)
    assert cf2.might_contain(keys).all()


def test_cuckoo_saturation_reported():
    cf = CuckooFilter(16)  # tiny: 16 buckets * 4 slots
    ok = cf.insert(_keys(200, 10))
    assert not ok  # must report saturation, not silently lose keys


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=200, unique=True))
def test_cuckoo_property_insert_contains_delete(xs):
    keys = np.array(xs, dtype=np.int64).view(np.uint64)
    cf = CuckooFilter.for_capacity(max(1000, len(keys) * 2))
    assert cf.insert(keys)
    assert cf.might_contain(keys).all()
    cf.delete(keys)
    assert cf.might_contain(keys).mean() <= 0.05
