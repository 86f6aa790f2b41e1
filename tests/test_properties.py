"""Hypothesis property tests (SURVEY.md §5.3): engine expressions vs plain
Python reference implementations on adversarial inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from k_means_map_reduce_spark.functions.text import (
    punct_ratio,
    token_count,
    word_count,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=200,
)

# re.ASCII: Java/RE2 \s is ASCII-only; Python's default is Unicode-aware
_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", re.ASCII)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_token_count_matches_python(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
    expected = [len(_TOKEN_RE.findall(t)) for t in texts]
    assert got == expected


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_word_count_matches_python(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [r[0] for r in df.select(word_count(F.col("text"))).collect()]
    # Model Spark's exact semantics: Java regex \s is [ \t\n\x0B\f\r]
    # (ASCII-only — does NOT match U+00A0 etc., unlike Python str.strip()),
    # and empty segments are dropped, so no strip() is needed.
    expected = [
        len([w for w in re.split(r"[ \t\n\x0B\f\r]+", t) if w]) for t in texts
    ]
    assert got == expected


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_punct_ratio_bounds(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [r[0] for r in df.select(punct_ratio(F.col("text"))).collect()]
    assert all(0.0 <= g <= 1.0 for g in got)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_salted_aggregate_property(spark, rows):
    """salted(count,max) == plain(count,max) on arbitrary keyed doubles."""
    from k_means_map_reduce_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    plain = {
        r["k"]: (r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["mx"])
        for r in salted_aggregate(
            df, ["k"], {"n": ("v", "count"), "mx": ("v", "max")}, n_salts=4
        ).collect()
    }
    assert plain == salted


def test_stratified_sample_deterministic_and_bounded(spark, oracle_sf_dir):
    """sampleBy with a fixed seed must be reproducible exactly, and each
    stratum's sampled count must sit within loose binomial bounds of
    fraction * stratum size."""
    from k_means_map_reduce_spark.registry import QUERIES
    from k_means_map_reduce_spark.sources import load_table

    a = {r["o_orderstatus"]: r["n_sampled"]
         for r in QUERIES["sample_stratified_orders"](spark, oracle_sf_dir).collect()}
    b = {r["o_orderstatus"]: r["n_sampled"]
         for r in QUERIES["sample_stratified_orders"](spark, oracle_sf_dir).collect()}
    assert a == b
    totals = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, oracle_sf_dir, "orders")
        .groupBy("o_orderstatus").count().withColumnRenamed("count", "n").collect()
    }
    fracs = {"F": 0.2, "O": 0.1, "P": 0.05}
    for status, frac in fracs.items():
        n, got = totals[status], a.get(status, 0)
        mean = frac * n
        slack = 5 * (mean * (1 - frac)) ** 0.5 + 5
        assert abs(got - mean) <= slack, (status, got, mean, slack)


def test_histogram_degenerate_all_equal(spark, tmp_path):
    """All-equal values ⇒ zero bucket width. Both the Spark query and the
    DuckDB oracle must short-circuit to a single bucket 0 (no NaN/Infinity
    from 0/0 division), and agree with each other."""
    import datetime

    from k_means_map_reduce_spark.oracle import run_oracle
    from k_means_map_reduce_spark.registry import ORACLES, QUERIES
    from k_means_map_reduce_spark.sources import TABLE_SCHEMAS

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "o_orderkey": range(50),
            "o_custkey": [i % 7 for i in range(50)],
            "o_orderstatus": "O",
            "o_totalprice": 1000.0,
            "o_orderdate": datetime.datetime(2021, 1, 1),
            "o_orderpriority": "1-URGENT",
        }
    )
    # single-file layout, like the driver's testdata tables
    pq.write_table(pa.Table.from_pandas(pdf), str(tmp_path / "orders.parquet"))
    assert TABLE_SCHEMAS["orders"]  # same columns as the real table

    got = QUERIES["histogram_order_totalprice"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["bucket"], r["n"], r["bucket_lo"]) == (0, 50, 1000.0)

    odf = run_oracle(str(tmp_path), ORACLES["histogram_order_totalprice"])
    assert len(odf) == 1
    orow = odf.iloc[0]
    assert (int(orow["bucket"]), int(orow["n"]), float(orow["bucket_lo"])) == (0, 50, 1000.0)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=60, unique=True)
)
def test_bloom_never_false_negative_property(spark, keys):
    """Adversarial key sets (negatives, extremes): every inserted key must
    probe positive — bloom_semi_join's exactness rests on this."""
    from k_means_map_reduce_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom_words,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k LONG")
    words = build_bloom_words(df, "k", num_bits=1 << 10)
    assert df.where(bloom_might_contain(F.col("k"), words)).count() == len(keys)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=0, max_value=10**9),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_zorder_interleave_matches_python(spark, pairs):
    """Morton interleave vs a plain-Python bit loop on arbitrary 30-bit
    inputs (already-ranked values: feed interleave_bits directly)."""
    from k_means_map_reduce_spark.functions.zorder import interleave_bits

    df = spark.createDataFrame(pairs, "x LONG, y LONG")
    got = [
        r[0]
        for r in df.select(
            interleave_bits(F.col("x"), F.col("y"))
        ).collect()
    ]

    def morton(x: int, y: int) -> int:
        out = 0
        for i in range(31):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got == [morton(x, y) for x, y in pairs]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**31 - 2), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_pmh_signature_agg_matches_python(spark, shingle_sets):
    """The explode->multi-min-aggregate signature (lesson 26 rewrite) must
    equal the direct per-doc min over (a*h + b) mod p for every permutation
    — the property that breaks if the aggregation loses a permutation
    column or the modulus drifts."""
    from k_means_map_reduce_spark.operators.dedup import (
        _PMH_P,
        _PMH_PERMS24,
        _pmh_signatures,
    )

    df = spark.createDataFrame(
        [(i, hs) for i, hs in enumerate(shingle_sets)],
        "doc_id long, sh array<long>",
    )
    got = {
        r["doc_id"]: [r[f"s{j}"] for j in range(len(_PMH_PERMS24))]
        for r in _pmh_signatures(df, _PMH_PERMS24).collect()
    }
    for i, hs in enumerate(shingle_sets):
        want = [min((a * h + b) % _PMH_P for h in hs) for a, b in _PMH_PERMS24]
        assert got[i] == want, (i, hs)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                width=32,
            ),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_unrolled_vector_math_bitwise_equals_fold(spark, vecs):
    """dot_unrolled / l2_norm_unrolled (the r13 opt-in codegen fast path)
    must be BIT-IDENTICAL to the aggregate/zip_with folds: same leading
    0.0 literal, same left-associated addition order. Compared via
    to_binary so -0.0 vs 0.0 or any last-ulp drift fails loudly."""
    from k_means_map_reduce_spark.functions.vectors import (
        dot,
        dot_unrolled,
        l2_norm,
        l2_norm_unrolled,
    )

    pairs = [(vecs[i], vecs[(i + 1) % len(vecs)]) for i in range(len(vecs))]
    df = spark.createDataFrame(pairs, "a array<float>, b array<float>")
    rows = df.select(
        dot(F.col("a"), F.col("b")).alias("fold_dot"),
        dot_unrolled(F.col("a"), F.col("b")).alias("un_dot"),
        l2_norm(F.col("a")).alias("fold_norm"),
        l2_norm_unrolled(F.col("a")).alias("un_norm"),
    ).collect()
    import struct

    for r in rows:
        assert struct.pack("<d", r["fold_dot"]) == struct.pack(
            "<d", r["un_dot"]
        )
        assert struct.pack("<d", r["fold_norm"]) == struct.pack(
            "<d", r["un_norm"]
        )


def test_unrolled_vector_math_fallback_path(spark):
    """Non-UNROLL_DIM lengths and NULL arrays must route to the fold branch
    (same values), and never raise under ANSI element_at."""
    from k_means_map_reduce_spark.functions.vectors import (
        dot,
        dot_unrolled,
        l2_norm,
        l2_norm_unrolled,
    )

    df = spark.createDataFrame(
        [
            ([1.5, -2.0, 3.25], [2.0, 0.5, -1.0]),
            (None, [1.0, 2.0, 3.0]),
            ([0.0] * 64, [1.0] * 64),
        ],
        "a array<float>, b array<float>",
    )
    rows = df.select(
        dot(F.col("a"), F.col("b")).alias("fd"),
        dot_unrolled(F.col("a"), F.col("b")).alias("ud"),
        l2_norm(F.col("a")).alias("fn"),
        l2_norm_unrolled(F.col("a")).alias("un"),
    ).collect()
    for r in rows:
        assert r["fd"] == r["ud"]
        assert r["fn"] == r["un"]


def test_embeddings_dim_matches_unroll_dim(spark, sf_dir):
    """r13 advice item 3: the unrolled fast path only fires at UNROLL_DIM —
    if the embeddings tables ever change dimension, every opted-in call
    site would silently route through the slow fold. Pin the testdata dim
    to the constant so a drift is loud."""
    from k_means_map_reduce_spark.functions.vectors import UNROLL_DIM
    from k_means_map_reduce_spark.sources import load_table

    dims = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.size("embedding").alias("d"))
        .distinct()
        .collect()
    )
    assert [r["d"] for r in dims] == [UNROLL_DIM]
