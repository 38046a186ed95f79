"""Unit differentials for the session-8 operator block: Bloom-filter
semi-join pruning (brute python bit mirror) and count-min sketch
(register-plane replay + upper-bound invariant)."""

import hashlib
import random

from pyspark.sql import functions as F


def _h60(salt: str, key) -> int:
    return int(hashlib.md5(
        (salt + "\x1f" + str(key)).encode()).hexdigest()[:15], 16)


def _bloom_positions_py(key, n_bits: int, k: int, salt: str):
    h1 = _h60(f"{salt}-a", key) % n_bits
    h2 = _h60(f"{salt}-b", key) % (n_bits - 1) + 1
    return [(h1 + i * h2) % n_bits for i in range(k)]


def test_bloom_no_false_negatives_and_python_differential(spark):
    from mapbox_filter_spark.operators.sketch import (bloom_build,
                                                      bloom_prune)

    rng = random.Random(8)
    members = sorted(rng.sample(range(100000), 60))
    probes = members + sorted(rng.sample(range(100000, 200000), 400))
    n_words, k, salt = 8, 3, "t8"
    n_bits = n_words * 63

    dim = spark.createDataFrame([(m,) for m in members], "key long")
    fact = spark.createDataFrame([(p,) for p in probes], "key long")
    bloom = bloom_build(dim, "key", n_words=n_words, k=k, salt=salt)
    got = {r["key"]: r["bloom_pass"]
           for r in bloom_prune(fact, bloom, "key", n_words=n_words,
                                k=k, salt=salt).collect()}

    words = [0] * n_words
    for m in members:
        for p in _bloom_positions_py(m, n_bits, k, salt):
            words[p // 63] |= 1 << (p % 63)
    for q in probes:
        want = all((words[p // 63] >> (p % 63)) & 1
                   for p in _bloom_positions_py(q, n_bits, k, salt))
        assert got[q] == want, q
    # the Bloom contract itself: every member passes
    assert all(got[m] for m in members)
    # and the filter is non-vacuous: some non-member fails
    assert not all(got[q] for q in probes)


def test_bloom_build_is_dense_array(spark):
    from mapbox_filter_spark.operators.sketch import bloom_build
    dim = spark.createDataFrame([(1,)], "key long")
    row = bloom_build(dim, "key", n_words=4, k=2, salt="t8d").collect()
    assert len(row) == 1 and len(row[0]["bloom"]) == 4
    assert sum(bin(w & ((1 << 63) - 1)).count("1")
               for w in row[0]["bloom"]) <= 2


def test_cms_python_differential_and_upper_bound(spark):
    from mapbox_filter_spark.operators.sketch import (cms_query,
                                                      cms_registers)

    rng = random.Random(88)
    data = [rng.randrange(40) for _ in range(3000)]
    d, w, salt = 3, 16, "t8c"  # tiny plane → heavy collisions
    df = spark.createDataFrame([(v,) for v in data], "key long")
    regs = cms_registers(df, "key", d=d, w=w, salt=salt)
    est = {r["key"]: r["est"]
           for r in cms_query(regs, df, "key", d=d, w=w,
                              salt=salt).collect()}

    plane = {}
    for v in data:
        for i in range(d):
            c = _h60(f"{salt}-{i}", v) % w
            plane[(i, c)] = plane.get((i, c), 0) + 1
    exact = {}
    for v in data:
        exact[v] = exact.get(v, 0) + 1
    for key, n in exact.items():
        want = min(plane[(i, _h60(f"{salt}-{i}", key) % w)]
                   for i in range(d))
        assert est[key] == want, key
        assert est[key] >= n, key


def test_cms_weighted(spark):
    from mapbox_filter_spark.operators.sketch import (cms_query,
                                                      cms_registers)
    df = spark.createDataFrame([(1, 5), (1, 7), (2, 3)], "key long, wt long")
    regs = cms_registers(df, "key", d=2, w=64, salt="t8w",
                         weight_col="wt")
    est = {r["key"]: r["est"]
           for r in cms_query(regs, df.select("key"), "key", d=2, w=64,
                              salt="t8w").collect()}
    assert est[1] >= 12 and est[2] >= 3
