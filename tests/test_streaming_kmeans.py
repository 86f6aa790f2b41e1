"""Streaming mini-batch K-Means: exactness, decay semantics, query smoke."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from k_means_map_reduce_spark.streaming.kmeans_stream import kmeans_streaming


def _blobs(spark, centers, n_per, spread, seed=7):
    rng = random.Random(seed)
    rows = []
    i = 0
    for c in centers:
        for _ in range(n_per):
            rows.append(
                (i, [x + rng.uniform(-spread, spread) for x in c])
            )
            i += 1
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


BLOB_CENTERS = [[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]]


def test_streaming_equals_running_mean_on_separated_blobs(spark):
    """With decay=1 and assignments that never flip (blobs far apart,
    init inside each blob), the streaming update IS the running mean: final
    centers must equal the exact per-blob means to float precision."""
    df = _blobs(spark, BLOB_CENTERS, n_per=40, spread=1.0)
    r = kmeans_streaming(
        spark, df, k=3, n_chunks=4, decay=1.0, init_centers=BLOB_CENTERS
    )
    # exact means, computed driver-side
    pts = df.orderBy("vec_id").collect()
    for b, c in enumerate(BLOB_CENTERS):
        members = [p["embedding"] for p in pts if _nearest(p["embedding"], BLOB_CENTERS) == b]
        mean = [sum(x[d] for x in members) / len(members) for d in range(2)]
        got = r.centers[b]
        assert max(abs(a - g) for a, g in zip(mean, got)) < 1e-9
        assert r.weights[b] == len(members)
    assert r.n_batches == 4
    assert r.n_points == 120


def _nearest(v, cents):
    return min(
        range(len(cents)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(v, cents[i])),
    )


def test_decay_forgets_old_batches(spark):
    """decay<1 must weight late data more: stream blob A then blob B with
    one shared center — the final center lands closer to B's mean than the
    undecayed running mean would."""
    rows = [(i, [0.0, 0.0]) for i in range(50)] + [
        (i, [10.0, 10.0]) for i in range(50, 100)
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    r = kmeans_streaming(
        spark, df, k=1, n_chunks=2, decay=0.5, init_centers=[[0.0, 0.0]]
    )
    undecayed_mean = 5.0
    assert r.centers[0][0] > undecayed_mean + 1.0
    assert r.centers[0][0] < 10.0


def test_streaming_query_runs(spark, sf_dir):
    from k_means_map_reduce_spark.registry import QUERIES

    out = QUERIES["kmeans_streaming_clusters"](spark, sf_dir).collect()
    # since round 7 the registered query emits the oracled invariant
    # contract row (see clustering._kmeans_contract_df)
    assert len(out) == 1
    row = out[0]
    assert row["n_points"] > 0 and row["tss"] > 0
    assert row["mass_ok"] and row["wssse_le_tss"]
