"""Text-function behavior on real (hand-written) language samples."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_map_reduce_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
)
from k_means_map_reduce_spark.registry import QUERIES

SAMPLES = [
    ("the quick brown fox is one of the animals that lives in the forest", "en"),
    ("el perro corre por la calle y los gatos duermen en el sol", "es"),
    ("le chat dort dans la maison et les oiseaux chantent dans le jardin", "fr"),
    ("der hund ist nicht klein und das haus ist mit einem garten", "de"),
    ("12345 67890 !!!", "und"),
]


def test_lang_id_on_real_samples(spark):
    df = spark.createDataFrame(SAMPLES, "text STRING, expected STRING")
    rows = df.select("expected", lang_id(F.col("text")).alias("pred")).collect()
    for r in rows:
        assert r["pred"] == r["expected"], rows


def test_quality_score_bounds_and_order(spark):
    df = spark.createDataFrame(
        [
            ("a well formed document with many reasonable english words and sentences that continue for a while providing substance",),
            ("!!! ??? ### $$$ %%%",),
        ],
        "text STRING",
    )
    scores = [r[0] for r in df.select(quality_score(F.col("text"))).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1], "garbage should score lower"


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("hello   world",), ("hello world",), ("Hello\tWorld",), ("different",)],
        "text STRING",
    )
    fps = [r[0] for r in df.select(doc_fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]


def test_quality_query_runs(spark, oracle_sf_dir):
    out = QUERIES["text_quality_scores"](spark, oracle_sf_dir)
    rows = out.collect()
    assert len(rows) == 500
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)


def test_winnowing_exact_dups_share_fingerprints(spark, oracle_sf_dir):
    """Docs with identical normalized text must get identical winnowing
    fingerprint stats (and every doc at least one fingerprint).

    Assertions run driver-side on the collected result: filtering the query
    output on computed columns (e.g. `where(n_fps < 1)`) would make Catalyst
    push the predicate down through every projection, inlining the full
    fingerprint expression tree into a pre-shuffle Filter and re-triggering
    the O(n²) evaluation the query's repartition barrier exists to prevent.
    """
    import re

    from k_means_map_reduce_spark.registry import QUERIES
    from k_means_map_reduce_spark.sources import load_table

    rows = QUERIES["text_winnowing_fingerprints"](spark, oracle_sf_dir).collect()
    assert len(rows) > 0
    assert all(r["n_fps"] >= 1 for r in rows)
    assert all(r["min_fp"] <= r["max_fp"] for r in rows)
    docs = load_table(spark, oracle_sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    norm_key = {
        d["doc_id"]: re.sub(r"\s+", " ", d["text"].strip()).lower() for d in docs
    }
    by_key: dict[str, set] = {}
    for r in rows:
        k = norm_key[r["doc_id"]]
        by_key.setdefault(k, set()).add((r["n_fps"], r["min_fp"], r["max_fp"]))
    assert all(len(v) == 1 for v in by_key.values())


def test_winnowing_arrow_equals_expression_path(spark, oracle_sf_dir):
    """The Arrow/numpy fingerprinter must produce the exact same fingerprint
    SETS as the expression path for every document (not just same stats)."""
    from k_means_map_reduce_spark.operators.textops import winnow_fps, winnow_fps_arrow

    expr_fps = {
        r["doc_id"]: sorted(r["fps"])
        for r in winnow_fps(spark, oracle_sf_dir).collect()
    }
    arrow_fps = {
        r["doc_id"]: sorted(r["fps"])
        for r in winnow_fps_arrow(spark, oracle_sf_dir).collect()
    }
    assert expr_fps == arrow_fps


def test_pii_redaction_removes_everything(spark, sf_dir):
    """Every doc gets >=1 planted email/ip/phone; after redaction the
    re-scan must find zero PII in every row."""
    rows = QUERIES["text_pii_redaction"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_emails"] >= 1 and r["n_ips"] >= 1 and r["n_phones"] >= 1, r
        assert r["residual_pii"] == 0, r


def test_mtld_walk_invariants_and_python_replay(spark, sf_dir):
    """MTLD end-state invariants plus an INDEPENDENT plain-Python replay
    from the parquet: the walk is re-run with a dict-free set fold straight
    off pandas/pyarrow (no Spark, no DuckDB) and every integer column must
    match; mtld_fwd is re-derived from the integers."""
    import pyarrow.parquet as pq

    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_mtld_diversity"](spark, sf_dir).collect()
    }
    assert len(rows) > 0
    import os
    import re

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pydict()
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        toks = [t for t in re.sub(r"\s+", " ", text.strip()).lower().split(" ") if t]
        f = c = t = 0
        seen: set = set()
        for tok in toks:
            c += 1
            if tok not in seen:
                t += 1
                seen.add(tok)
            if t * 100 < 72 * c:
                f += 1
                c = t = 0
                seen = set()
        r = rows[doc_id]
        assert (r["n_tokens"], r["factors"], r["rem_tokens"], r["rem_types"]) == (
            len(toks), f, c, t,
        ), doc_id
        # invariants: a factor consumes >= 2 tokens; remainder types bound
        assert r["rem_types"] <= r["rem_tokens"] <= r["n_tokens"]
        assert 2 * r["factors"] <= r["n_tokens"]
        if r["mtld_fwd"] is not None:
            assert r["mtld_fwd"] > 0
