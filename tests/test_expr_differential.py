"""Differential test of the Column compiler vs the pure-Python interpreter.

Generates seeded random expressions from the SURVEY.md §2.1 grammar and random
features, evaluates every (expression, feature) pair both ways, and demands
exact agreement.  All Spark evaluations are batched into a handful of jobs
(one select with many predicate columns) so the test stays fast.
"""

import random

import pytest
from pyspark.sql import Row, types as SqlT

from mapbox_filter_spark.style import (
    parse_expression, type_check_filter, compile_filter, finalize_predicate,
)
from mapbox_filter_spark.style.typecheck import TypeCheckError
from mapbox_filter_spark.style import pyinterp

KEYS = ["class", "brunnel", "name", "rank", "intermittent", "level"]
STR_VALS = ["river", "stream", "tunnel", "bridge", "", "x y", "5a"]
NUM_VALS = [0, 1, 2, 5, -3, 2.5]
# strings that exercise tag inference: numeric-looking, bool-looking, plus
# the adversarial parse corners (round-1 advice): NaN/Infinity spellings
# (rejected on both paths), Java type suffixes and hex-floats (accepted by
# Spark's cast), python-isms (underscores, fullwidth digits — rejected by
# Spark), overflow-to-Infinity, and to-string boundary magnitudes (1e7 /
# 1e-4 flip Java Double.toString into scientific notation).
TRICKY_VALS = [
    "5", "0", "2.5", "true", "false", "-3",
    "NaN", "Infinity", "-Infinity", "inf", "nan",
    "1e999", "-1e999", "5d", "-5f", "0x1Ap0", "0x1A",
    "1_000", "５", ".5", "5.", "+5", "1E3", "00", "5 5", " 7 ",
    "10000000", "9999999.5", "1e7", "0.001", "0.0001", "1e-4",
    "12345678.9", "1e16", "-0.0",
]
# literals compared against ["to-string", get]: canonical Java Double
# renderings on the scientific-notation boundary + bool/plain forms
TOSTR_LITS = ["1.0E7", "10000000.0", "9999999.5", "0.001", "1.0E-4",
              "0.0001", "1.23456789E7", "2.5", "-3.0", "Infinity", "true",
              "river", "5", "1000.0"]


def gen_value(rng: random.Random):
    r = rng.random()
    if r < 0.4:
        return rng.choice(STR_VALS + TRICKY_VALS)
    if r < 0.7:
        return str(rng.choice(NUM_VALS))
    return rng.choice(["true", "false"])


def gen_feature(rng: random.Random):
    props = {}
    for k in KEYS:
        if rng.random() < 0.75:  # ~25% missing-key rate
            props[k] = gen_value(rng)
    return {
        "feature_id": rng.randrange(1, 1000),
        "geom_kind": rng.choice(["Point", "LineString", "Polygon"]),
        "props": props,
    }


def gen_get(rng):
    return ["get", rng.choice(KEYS)]


def gen_scalar(rng, depth):
    """Expression of type num or str (for comparisons)."""
    r = rng.random()
    if r < 0.3:
        return ["number", gen_get(rng)] + ([rng.choice(NUM_VALS)] if rng.random() < 0.3 else [])
    if r < 0.6:
        return ["string", gen_get(rng)] + ([rng.choice(STR_VALS)] if rng.random() < 0.3 else [])
    if r < 0.8:
        return ["to-number", gen_get(rng)] if rng.random() < 0.5 else rng.choice(NUM_VALS)
    return rng.choice(STR_VALS) if rng.random() < 0.5 else rng.choice(NUM_VALS)


def gen_bool(rng: random.Random, depth: int):
    if depth <= 0:
        return rng.choice([True, False, ["has", rng.choice(KEYS)]])
    r = rng.random()
    if r < 0.12:
        return ["has", rng.choice(KEYS)]
    if r < 0.24:
        return ["!", gen_bool(rng, depth - 1)]
    if r < 0.40:
        op = rng.choice(["all", "any"])
        n = rng.randrange(0, 4)
        return [op] + [gen_bool(rng, depth - 1) for _ in range(n)]
    if r < 0.55:
        op = rng.choice(["==", "!="])
        if rng.random() < 0.5:
            return [op, gen_get(rng), rng.choice(STR_VALS + NUM_VALS + [True, False])]
        s = gen_scalar(rng, depth - 1)
        lit = rng.choice(NUM_VALS) if (isinstance(s, list) and s[0] in ("number", "to-number")) or isinstance(s, (int, float)) else rng.choice(STR_VALS)
        return [op, s, lit]
    if r < 0.70:
        op = rng.choice(["<", "<=", ">", ">="])
        if rng.random() < 0.5:
            return [op, ["number", gen_get(rng)], rng.choice(NUM_VALS)]
        return [op, ["string", gen_get(rng)], rng.choice(STR_VALS)]
    if r < 0.82:
        # match with bool outputs
        if rng.random() < 0.5:
            inp = ["string", gen_get(rng), rng.choice(STR_VALS)]
            labels = rng.sample(STR_VALS, k=rng.randrange(1, 3))
        else:
            inp = gen_get(rng)
            pool = STR_VALS if rng.random() < 0.5 else NUM_VALS
            labels = rng.sample(pool, k=rng.randrange(1, 3))
        return ["match", inp, labels, gen_bool(rng, depth - 1),
                gen_bool(rng, depth - 1)]
    if r < 0.87:
        return ["to-boolean", gen_get(rng)]
    if r < 0.95:
        # to-string canonicalization: hits the Java Double.toString replica
        return ["==", ["to-string", gen_get(rng)], rng.choice(TOSTR_LITS)]
    return ["==", ["geometry-type"], rng.choice(["Point", "LineString", "Polygon", "bogus"])]


FEATURE_SCHEMA = SqlT.StructType([
    SqlT.StructField("feature_id", SqlT.LongType()),
    SqlT.StructField("geom_kind", SqlT.StringType()),
    SqlT.StructField("props", SqlT.MapType(SqlT.StringType(), SqlT.StringType())),
])


import pytest


@pytest.mark.parametrize("seed", [42, 20260816, 777])
def test_differential(spark, seed):
    rng = random.Random(seed)
    features = [gen_feature(rng) for _ in range(40)]

    exprs = []
    attempts = 0
    while len(exprs) < 120 and attempts < 3000:
        attempts += 1
        fj = gen_bool(rng, 3)
        try:
            texp = type_check_filter(parse_expression(fj))
        except (TypeCheckError, Exception):
            continue
        exprs.append((fj, texp))
    assert len(exprs) == 120

    df = spark.createDataFrame([Row(**f) for f in features], schema=FEATURE_SCHEMA)
    cols = [
        finalize_predicate(compile_filter(fj)).alias(f"p{i}")
        for i, (fj, _) in enumerate(exprs)
    ]
    rows = df.select(*cols).collect()

    mismatches = []
    for fi, (feat, row) in enumerate(zip(features, rows)):
        for i, (fj, texp) in enumerate(exprs):
            expected = pyinterp.run_filter(texp, feat)
            got = row[f"p{i}"]
            if got != expected:
                mismatches.append((fj, feat["props"], feat["geom_kind"], expected, got))
    assert not mismatches, f"{len(mismatches)} mismatches; first 3: {mismatches[:3]}"
