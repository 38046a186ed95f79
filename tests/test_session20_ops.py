"""Session-20 operator blocks: unit differentials + edge pins.

Each operator's oracle gate lives in tests/test_oracle.py via the
queries()/oracle_sql() registry; these tests are the independent brute
python replays and hand-pinned edge cases.
"""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F


# ---- dp_histogram (deterministic discrete-Laplace release) ----

def _brute_dlap_z(cell_key, salt, epsilon, z_max):
    u = int(hashlib.md5(
        (salt + "\x1f" + cell_key).encode()).hexdigest()[:15], 16)
    a = math.exp(-epsilon)
    z = -z_max
    for k in range(-z_max, z_max):
        if k < 0:
            f = a ** (-k) / (1.0 + a)
        else:
            f = 1.0 - a ** (k + 1) / (1.0 + a)
        if u >= int(f * float(1 << 60)):
            z += 1
    return z


def test_dp_histogram_differential(spark):
    from mapbox_filter_spark.operators.privacy import dp_histogram

    rng = random.Random(11)
    rows = [(f"c{rng.randrange(12):02d}",) for _ in range(400)]
    df = spark.createDataFrame(rows, "cell string")
    got = {r["cell"]: r["n_noisy"]
           for r in dp_histogram(df, ["cell"], epsilon=0.5,
                                 salt="t", z_max=16).collect()}
    from collections import Counter

    cnt = Counter(c for c, in rows)
    want = {c: max(n + _brute_dlap_z(c, "t", 0.5, 16), 0)
            for c, n in cnt.items()}
    assert got == want


def test_dp_histogram_noise_spread(spark):
    """Across many cells the deterministic draws must behave like the
    DL distribution: both signs present, clamp respected, zero modal."""
    from mapbox_filter_spark.operators.privacy import dp_histogram

    # every cell has exactly 100 members -> noise = n_noisy - 100
    rows = [(f"cell{i:04d}",) for i in range(500) for _ in range(100)]
    df = spark.createDataFrame(rows, "cell string")
    out = dp_histogram(df, ["cell"], epsilon=0.5, salt="spread",
                       z_max=16).collect()
    noise = sorted(r["n_noisy"] - 100 for r in out)
    assert min(noise) >= -16 and max(noise) <= 16
    assert min(noise) < 0 < max(noise)
    from collections import Counter

    modal = Counter(noise).most_common(1)[0][0]
    assert abs(modal) <= 1


def test_dp_histogram_validation(spark):
    from mapbox_filter_spark.operators.privacy import dp_histogram

    df = spark.createDataFrame([("a",)], "cell string")
    with pytest.raises(ValueError):
        dp_histogram(df, ["cell"], epsilon=0.0, salt="s")
    with pytest.raises(ValueError):
        dp_histogram(df, ["cell"], epsilon=1.0, salt="s", z_max=0)
