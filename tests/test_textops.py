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
