"""Training-pipeline ops: deterministic split + contamination detection.

Oracle parity is covered by the registry sweep (test_oracle_parity); these
tests pin the *semantic* contract — stability, disjointness, and that
contamination pairs really straddle the train/test boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_map_reduce_spark.registry import QUERIES

from k_means_map_reduce_spark.operators.training import (
    contamination_train_test_ngrams,
    split_train_valid_test,
)


def test_split_deterministic_and_exhaustive(spark, oracle_sf_dir):
    a = split_train_valid_test(spark, oracle_sf_dir).toPandas().set_index("doc_id")
    b = split_train_valid_test(spark, oracle_sf_dir).toPandas().set_index("doc_id")
    assert a.sort_index().equals(b.sort_index())  # re-run stable
    assert set(a["split"].unique()) <= {"train", "valid", "test"}
    assert a["bucket"].between(0, 99).all()
    # bucket→split mapping is total and consistent
    assert (a.loc[a["bucket"] < 90, "split"] == "train").all()
    assert (a.loc[(a["bucket"] >= 90) & (a["bucket"] < 95), "split"] == "valid").all()
    assert (a.loc[a["bucket"] >= 95, "split"] == "test").all()


def test_split_fractions_near_nominal(spark, oracle_sf_dir):
    pdf = split_train_valid_test(spark, oracle_sf_dir).toPandas()
    n = len(pdf)
    frac_train = (pdf["split"] == "train").sum() / n
    # md5 buckets are uniform; 4-sigma binomial bound at n=500 is ~5.4pp
    assert abs(frac_train - 0.90) < 0.06
    assert (pdf["split"] == "valid").sum() > 0
    assert (pdf["split"] == "test").sum() > 0


def test_contamination_pairs_straddle_the_split(spark, oracle_sf_dir):
    pairs = contamination_train_test_ngrams(spark, oracle_sf_dir).toPandas()
    splits = (
        split_train_valid_test(spark, oracle_sf_dir)
        .toPandas()
        .set_index("doc_id")["split"]
    )
    assert len(pairs) > 0  # sf0.01 corpus has known cross-split near-dups
    for _, row in pairs.iterrows():
        assert splits[row["train_doc"]] == "train"
        assert splits[row["test_doc"]] == "test"
        assert row["shared_ngrams"] >= 2


def test_contamination_no_python_udf(spark, oracle_sf_dir):
    plan = (
        contamination_train_test_ngrams(spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


def test_pack_sequences_invariants(spark, oracle_sf_dir):
    """Packing must conserve the train split exactly: every train doc in
    exactly one sequence, doc ranges contiguous and ordered, and each
    sequence except possibly the last starts before its budget boundary."""
    from k_means_map_reduce_spark.operators.training import (
        _PACK_BUDGET,
        split_train_valid_test,
        training_pack_sequences,
    )

    seqs = (
        training_pack_sequences(spark, oracle_sf_dir)
        .toPandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    n_train = (
        split_train_valid_test(spark, oracle_sf_dir)
        .where("split = 'train'")
        .count()
    )
    assert int(seqs["n_docs"].sum()) == n_train
    # doc ranges tile the train split in order without overlap
    for i in range(1, len(seqs)):
        assert seqs.loc[i, "first_doc_id"] > seqs.loc[i - 1, "last_doc_id"]
    # cumulative token starts respect the budget: seq s begins at the first
    # doc whose running offset crosses s*budget, so per-sequence token mass
    # is positive and (except the final partial fill) >= one doc
    assert (seqs["total_tokens"] > 0).all()
    starts = seqs["total_tokens"].cumsum().shift(fill_value=0)
    assert ((starts // _PACK_BUDGET) == seqs["seq_id"]).all()


def test_epoch_shuffle_independent_permutations(spark, sf_dir):
    """Each epoch is a complete permutation of the corpus, and distinct
    epochs give (essentially) different orders — the point of keying the
    hash on the epoch."""
    rows = QUERIES["training_epoch_shuffle"](spark, sf_dir).collect()
    by_epoch: dict[int, dict[int, int]] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["position"]
    assert set(by_epoch) == {0, 1, 2}
    n = len(by_epoch[0])
    for e, perm in by_epoch.items():
        assert sorted(perm.values()) == list(range(1, n + 1)), e
    moved = sum(1 for d in by_epoch[0] if by_epoch[0][d] != by_epoch[1][d])
    assert moved > 0.9 * n


def test_negative_pairs_shape(spark, sf_dir):
    """4 negatives per anchor (minus self-collisions), never the anchor
    itself, all negative ids exist in the corpus."""
    rows = QUERIES["training_negative_pairs"](spark, sf_dir).collect()
    per_anchor: dict[int, int] = {}
    for r in rows:
        assert r["negative_id"] != r["anchor_id"]
        per_anchor[r["anchor_id"]] = per_anchor.get(r["anchor_id"], 0) + 1
    assert per_anchor and max(per_anchor.values()) <= 4
    assert sum(per_anchor.values()) >= 3.9 * len(per_anchor)


def test_loo_encoding_mean_reconstruction(spark, sf_dir):
    """Leave-one-out identity: the AVERAGE of a category's LOO encodings
    equals the category's plain mean target — sum_i (S - y_i)/(n-1)
    = (nS - S)/(n-1) = S, so avg = S/n. Proves the encoding leaks no
    per-row information in aggregate while re-centering correctly (the
    property that breaks if the self-exclusion is off by one row)."""
    rows = QUERIES["features_target_encoding_loo"](spark, sf_dir).collect()
    from collections import defaultdict

    by_cat = defaultdict(list)
    for r in rows:
        assert r["n_cat"] > 1  # every priority has many orders
        by_cat[r["priority"]].append(r["loo_enc"])
    from k_means_map_reduce_spark.sources import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    means = {
        r["priority"]: r["m"]
        for r in o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    }
    for cat, encs in by_cat.items():
        loo_mean = sum(encs) / len(encs)
        # per-row encodings are rounded at 6dp; the average inherits it
        assert abs(loo_mean - means[cat]) < 1e-4, (cat, loo_mean, means[cat])
