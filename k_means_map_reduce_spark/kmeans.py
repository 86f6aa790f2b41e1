"""K-Means: the reference engine's entire query surface, Spark-first.

Two implementations:

1. ``kmeans_mllib`` — delegate the whole loop to ``pyspark.ml.clustering.KMeans``
   (Lloyd's + k-means|| init, squared-distance, tol-based early stop). This is
   what a production 100 TB job should use.

2. ``kmeans_native`` — a transparent DataFrame-native Lloyd's loop that
   re-expresses every operator of the reference's MapReduce dataflow
   (SURVEY.md §2a ops #5-#17) with Catalyst-optimizable expressions:

   reference (file:line)                          → here
   ---------------------------------------------- → ----------------------------
   ranged text scan, per-iter re-read
     (/root/reference/mapper.py:15-24,46)         → ``df.cache()`` once
   random-sample init (master.py:54-65)           → seeded ``rdd.takeSample``
   nearest-centroid map, broadcast cross-join +
     argmin (mapper.py:45-87)                     → centroid literal array +
                                                    ``array_sort`` argmin expr
                                                    (broadcast, zero shuffle)
   hash partition by cid % R (mapper.py:32-38)    → Spark hash shuffle (implicit)
   group-by-key (reducer.py:58-61)                → ``groupBy("cid")``
   per-group vector mean (reducer.py:19-30)       → per-dimension ``avg`` with
                                                    map-side partial aggregation
   gather (master.py:238-247)                     → ``collect()`` of k×dim rows
   convergence ε=1e-6 (master.py:97-103)          → max centroid shift, joined
                                                    BY ID (fixes the reference's
                                                    positional-zip bug)
   fault tolerance (master.py:161-235)            → Spark task retry / lineage

   Deliberate semantic fixes vs the reference (SURVEY.md §2a quirks):
   - N-dimensional (reference hard-codes 2-D at mapper.py:27-28, 99).
   - Empty clusters keep their previous centroid instead of vanishing
     (reference drops them, reducer.py:65-67, shrinking k).
   - Ties broken deterministically toward the lowest centroid id (reference
     keeps first-in-iteration-order, mapper.py:64 — same outcome).

Scale notes: the per-iteration plan is scan(cached) → project(argmin expr) →
partial agg → single k×dim shuffle → final agg → collect(k rows). No cross
join, no window, no Python on the hot path. Centroids ride into executors as
a code-generated literal array (fine for k·dim ≤ ~64k; beyond that, swap the
literal for a broadcast join — interface unchanged).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.vectors import sq_euclidean


@dataclass
class KMeansResult:
    centers: list[list[float]]  # index = cluster id
    iterations: int
    converged: bool
    wssse_history: list[float] = field(default_factory=list)
    sizes: dict[int, int] = field(default_factory=dict)  # cluster id -> |points| at final assignment


def _centroid_literal(centroids: list[list[float]]) -> Column:
    """Centroids as a literal array<struct<cid:int, cvec:array<double>>>.

    Built as ONE SQL expression string parsed JVM-side: constructing k·dim
    nested F.lit Columns costs hundreds of py4j round-trips per iteration
    (~0.3 s at k=8, dim=64), which would dominate small-batch iterations.
    repr(float) is the shortest exact round-trip form, so no precision loss.
    """
    parts = []
    for cid, vec in enumerate(centroids):
        arr = ",".join(f"{float(x)!r}D" for x in vec)
        parts.append(f"named_struct('cid', {cid}, 'cvec', array({arr}))")
    return F.expr("array(" + ",".join(parts) + ")")


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "vec"
) -> DataFrame:
    """Add ``cid``/``dist2``: nearest centroid per row (reference op #7).

    argmin = transform each centroid to struct(dist2, cid), array_sort (struct
    ordering = lexicographic ⇒ ties break toward the lowest cid), take head.
    Pure codegen expression — the map side of the reference's MapReduce, with
    the broadcast of centroids compiled into the plan.
    """
    cents = _centroid_literal(centroids)
    best = F.element_at(
        F.array_sort(
            F.transform(
                cents,
                lambda c: F.struct(
                    sq_euclidean(F.col(vec_col), c["cvec"]).alias("dist2"),
                    c["cid"].alias("cid"),
                ),
            )
        ),
        1,
    )
    return df.withColumn("cid", best["cid"]).withColumn("dist2", best["dist2"])


def _mean_by_cluster(assigned: DataFrame, dim: int) -> list[tuple[int, int, list[float], float]]:
    """groupBy(cid) → per-dimension avg + count + sum(dist2); single shuffle.

    Returns [(cid, n, mean_vec, sum_dist2)]. Catalyst plans this as partial
    (map-side) + final aggregation: the shuffle carries k×(dim+2) partials per
    input partition, not data rows — the same asymptotics as the reference's
    combiner-less reducer, minus the materialized partition files
    (/root/reference/mapper.py:72-84).
    """
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("dist2").alias("sum_dist2")]
    aggs += [
        F.avg(F.element_at(F.col("vec"), i + 1)).alias(f"m{i}") for i in range(dim)
    ]
    rows = assigned.groupBy("cid").agg(*aggs).collect()
    return [
        (r["cid"], r["n"], [r[f"m{i}"] for i in range(dim)], r["sum_dist2"])
        for r in rows
    ]


def _init_random(pts: DataFrame, k: int, seed: int) -> list[list[float]]:
    """Seeded uniform sample without replacement (reference op #5,
    master.py:54-65) — the reference's random.sample, distributed and seeded.
    Oversample 4x then keep the first k distinct vectors, avoiding a full
    distinct() shuffle just for init."""
    sample = pts.rdd.takeSample(False, 4 * k, seed=seed)
    if not sample:
        raise ValueError("empty input")
    centroids: list[list[float]] = []
    seen = set()
    for r in sample:
        key = tuple(r["vec"])
        if key not in seen:
            seen.add(key)
            centroids.append(list(r["vec"]))
        if len(centroids) == k:
            break
    if len(centroids) < k:
        distinct_sample = pts.distinct().rdd.takeSample(False, k, seed=seed)
        if len(distinct_sample) < k:
            raise ValueError(f"k={k} but only {len(distinct_sample)} distinct points")
        centroids = [list(r["vec"]) for r in distinct_sample]
    return centroids


def _init_kmeans_parallel(
    pts: DataFrame, k: int, seed: int, rounds: int = 5, oversample: float | None = None
) -> list[list[float]]:
    """k-means|| init (Bahmani, Moseley, Vattani, Kumar, Vassilvitskii —
    VLDB 2012): the scalable k-means++ — instead of k sequential passes,
    ~5 rounds each sampling ℓ=2k points with probability ℓ·d²(x,C)/φ_C,
    then a driver-side weighted Lloyd on the O(ℓ·rounds) candidates.

    Each round is one distributed pass: assign_clusters (codegen argmin vs
    the current candidate set) → φ via one agg → independent Bernoulli draws
    with a seeded rand(). Candidate weights (how many points each candidate
    owns) come from one final groupBy. Everything driver-side touches only
    the ≤ ℓ·rounds+1 candidates, never the data. This is the init MLlib uses
    by default, re-expressed in DataFrame ops — at 100 TB it replaces
    k-means++'s k passes with ~5."""
    ell = oversample if oversample is not None else 2.0 * k
    first = pts.rdd.takeSample(False, 1, seed=seed)
    if not first:
        raise ValueError("empty input")
    candidates: list[list[float]] = [list(first[0]["vec"])]
    for rnd in range(rounds):
        assigned = assign_clusters(pts, candidates, "vec")
        phi = assigned.agg(F.sum("dist2").alias("phi")).collect()[0]["phi"]
        if not phi or phi <= 0:  # all points coincide with candidates
            break
        new = (
            assigned.where(
                F.rand(seed + 1000 * (rnd + 1))
                < F.least(F.lit(1.0), F.lit(ell) * F.col("dist2") / F.lit(phi))
            )
            .select("vec")
            .collect()
        )
        seen = {tuple(c) for c in candidates}
        for r in new:
            key = tuple(r["vec"])
            if key not in seen:
                seen.add(key)
                candidates.append(list(r["vec"]))
    if len(candidates) <= k:
        # not enough candidates (tiny/degenerate input): pad with randoms
        pad = _init_random(pts, k, seed)
        seen = {tuple(c) for c in candidates}
        candidates += [c for c in pad if tuple(c) not in seen]
        return candidates[:k]
    # weight candidates by |points nearest to them|, then weighted Lloyd
    # driver-side on the small candidate set.
    wrows = (
        assign_clusters(pts, candidates, "vec")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    weights = [0.0] * len(candidates)
    for r in wrows:
        weights[r["cid"]] = float(r["n"])
    return _weighted_lloyd_local(candidates, weights, k, seed)


def _weighted_lloyd_local(
    xs: list[list[float]], ws: list[float], k: int, seed: int, iters: int = 30
) -> list[list[float]]:
    """Weighted k-means++ seeding + weighted Lloyd's on the driver
    (candidate set is O(k·rounds)). The ++ seeding is the part of the
    k-means|| recipe that makes the local refine land one center per dense
    region — seeding by raw weight alone can put two centers in one heavy
    cluster and merge two others."""
    import random as _random

    rng = _random.Random(seed)

    def _sq(a: list[float], b: list[float]) -> float:
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def _weighted_draw(weights: list[float]) -> int:
        total = sum(weights)
        r = rng.random() * total
        acc = 0.0
        for i, w in enumerate(weights):
            acc += w
            if r <= acc:
                return i
        return len(weights) - 1

    centers = [list(xs[_weighted_draw(ws)])]
    d2 = [_sq(x, centers[0]) for x in xs]
    while len(centers) < k:
        draw = [w * d for w, d in zip(ws, d2)]
        if sum(draw) <= 0:
            # all remaining mass sits on existing centers; fall back uniform
            centers.append(list(xs[rng.randrange(len(xs))]))
        else:
            centers.append(list(xs[_weighted_draw(draw)]))
        d2 = [min(d, _sq(x, centers[-1])) for x, d in zip(xs, d2)]
    dim = len(centers[0])
    for _ in range(iters):
        sums = [[0.0] * dim for _ in range(k)]
        wsum = [0.0] * k
        for x, w in zip(xs, ws):
            b = min(
                range(k),
                key=lambda c: sum((a - b_) ** 2 for a, b_ in zip(x, centers[c])),
            )
            wsum[b] += w
            for d in range(dim):
                sums[b][d] += w * x[d]
        new = [
            [s / wsum[c] for s in sums[c]]
            if wsum[c] > 0
            else list(xs[rng.randrange(len(xs))])
            for c in range(k)
        ]
        if all(
            sum((a - b_) ** 2 for a, b_ in zip(o, n_)) < 1e-18
            for o, n_ in zip(centers, new)
        ):
            centers = new
            break
        centers = new
    return centers


def kmeans_native(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-6,
    seed: int = 42,
    init: str = "random",
    init_rounds: int = 5,
) -> KMeansResult:
    """DataFrame-native Lloyd's loop (reference master.start, master.py:106-159).

    init: "random" (the reference's seeded sample) or "k||" (k-means||,
    MLlib's default init, re-expressed with DataFrame ops)."""
    pts = (
        df.select(F.col(vec_col).cast("array<double>").alias("vec"))
        .where(F.col("vec").isNotNull() & (F.size("vec") > 0))
        .cache()
    )

    if init == "k||":
        centroids = _init_kmeans_parallel(pts, k, seed, rounds=init_rounds)
    elif init == "random":
        centroids = _init_random(pts, k, seed)
    else:
        raise ValueError(f"unknown init {init!r}")
    dim = len(centroids[0])

    wssse_history: list[float] = []
    converged = False
    it = 0
    sizes: dict[int, int] = {}
    for it in range(1, max_iter + 1):
        assigned = assign_clusters(pts, centroids, "vec")
        stats = _mean_by_cluster(assigned, dim)
        new_centroids = list(centroids)  # empty clusters keep old centroid
        sizes = {cid: 0 for cid in range(k)}
        for cid, n, mean_vec, _sd in stats:
            new_centroids[cid] = mean_vec
            sizes[cid] = n
        wssse_history.append(sum(s[3] for s in stats))
        # Convergence (reference op #15, fixed to pair by id): every centroid
        # moved < tol in Euclidean distance.
        shift = max(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(old, new)))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            converged = True
            break
    pts.unpersist()
    return KMeansResult(centroids, it, converged, wssse_history, sizes)


def kmeans_native_df(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-6,
    seed: int = 42,
    init: str = "random",
    init_rounds: int = 5,
) -> DataFrame:
    """Run kmeans_native and return (cluster_id, size, center) as a DataFrame."""
    result = kmeans_native(
        df, vec_col=vec_col, k=k, max_iter=max_iter, tol=tol, seed=seed, init=init,
        init_rounds=init_rounds,
    )
    # sizes come from the final iteration's aggregation — no extra pass. (The
    # last assignment used the pre-update centroids; for a converged run the
    # difference is < tol.)
    rows = [
        (cid, int(result.sizes.get(cid, 0)), [float(x) for x in vec])
        for cid, vec in enumerate(result.centers)
    ]
    return spark.createDataFrame(
        rows, "cluster_id INT, size BIGINT, center ARRAY<DOUBLE>"
    )


def kmeans_mllib(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-6,
    seed: int = 42,
) -> DataFrame:
    """MLlib KMeans; returns (cluster_id, size, center ARRAY<DOUBLE>).

    array_to_vector / vector_to_array keep VectorUDT confined to the MLlib
    boundary (SURVEY.md §7 risk note).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).cache()
    model = KMeans(k=k, maxIter=max_iter, tol=tol, seed=seed).fit(feats)
    pred = model.transform(feats)
    sizes = {
        r["prediction"]: r["n"]
        for r in pred.groupBy("prediction").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    feats.unpersist()
    spark = df.sparkSession
    rows = [
        (cid, int(sizes.get(cid, 0)), [float(x) for x in center])
        for cid, center in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cluster_id INT, size BIGINT, center ARRAY<DOUBLE>")


def kmeans_arrow(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-6,
    seed: int = 42,
) -> KMeansResult:
    """Lloyd's loop with Arrow-batched numpy assignment — the scale path.

    Same semantics as kmeans_native (seeded init, empty-cluster retention,
    lowest-cid tie-break via argmin-first-occurrence, tol convergence), but
    the per-iteration work is ONE mapInPandas job:

      executors: Arrow batch → numpy matrix → |x|²+|c|²-2XCᵀ argmin (BLAS)
                 → per-partition partials (k rows: count, Σvec, Σdist²)
      driver:    merge ≤ k×P partial rows, update centroids, test shift.

    Why this beats the expression-tree loop at any scale: the centroid matrix
    rides a broadcast variable (no plan re-analysis / re-codegen per
    iteration — the plan is byte-identical every time), distance math is a
    dense matmul instead of per-element codegen, and the shuffle is replaced
    by a k×P-row collect. This mirrors MLlib's own RDD implementation
    (broadcast centers + treeAggregate) with DataFrame+Arrow plumbing.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    spark = df.sparkSession
    base = df.select(F.col(vec_col).cast("array<double>").alias("vec")).where(
        F.col("vec").isNotNull() & (F.size("vec") > 0)
    )
    # Right-size parallelism to the data: each iteration is one mapInPandas
    # job whose cost includes (Python worker round-trip) × partitions — 32
    # near-empty partitions per iteration is pure overhead on small inputs.
    # Target ~100k vectors per partition (comfortably Arrow-batched); at
    # 100 TB the same formula yields thousands of partitions. Note the
    # remaining small-input floor (~250 ms/iteration at 1 partition) is
    # driver-side job scheduling + per-iteration plan construction, not
    # worker count — it amortizes away once partitions carry real data.
    n_points = base.count()
    target = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-n_points // 100_000),  # ceil div
        ),
    )
    pts = base.coalesce(target).cache()
    sample = pts.rdd.takeSample(False, 4 * k, seed=seed)
    if not sample:
        raise ValueError("empty input")
    dim = len(sample[0]["vec"])
    centroids: list[list[float]] = []
    seen: set = set()
    for r in sample:
        key = tuple(r["vec"])
        if key not in seen:
            seen.add(key)
            centroids.append(list(r["vec"]))
        if len(centroids) == k:
            break
    if len(centroids) < k:
        raise ValueError(f"k={k} but sample found only {len(centroids)} distinct points")

    out_schema = (
        "cid INT, n BIGINT, sum_dist2 DOUBLE, sums ARRAY<DOUBLE>"
    )
    sc = spark.sparkContext

    wssse_history: list[float] = []
    sizes: dict[int, int] = {}
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        b = sc.broadcast(np.asarray(centroids, dtype=np.float64))

        def partials(batches, _b=b):
            import numpy as _np
            import pandas as _pd

            C = _b.value
            kk = C.shape[0]
            c_sq = (C * C).sum(axis=1)
            cnt = _np.zeros(kk, dtype=_np.int64)
            sums = _np.zeros_like(C)
            sd = _np.zeros(kk)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = _np.stack(pdf["vec"].to_numpy())
                d2 = (X * X).sum(axis=1)[:, None] + c_sq[None, :] - 2.0 * (X @ C.T)
                cid = d2.argmin(axis=1)  # first occurrence = lowest cid on ties
                best = _np.maximum(d2[_np.arange(len(X)), cid], 0.0)
                cnt += _np.bincount(cid, minlength=kk)
                sd += _np.bincount(cid, weights=best, minlength=kk)
                _np.add.at(sums, cid, X)
            nz = _np.nonzero(cnt)[0]
            yield _pd.DataFrame(
                {
                    "cid": nz.astype("int32"),
                    "n": cnt[nz],
                    "sum_dist2": sd[nz],
                    "sums": [sums[i].tolist() for i in nz],
                }
            )

        rows = pts.mapInPandas(partials, out_schema).collect()
        b.unpersist()

        import collections

        agg_n: dict[int, int] = collections.defaultdict(int)
        agg_sum = {cid: np.zeros(dim) for cid in range(k)}
        wssse = 0.0
        for r in rows:
            agg_n[r["cid"]] += r["n"]
            agg_sum[r["cid"]] += np.asarray(r["sums"])
            wssse += r["sum_dist2"]
        wssse_history.append(wssse)
        new_centroids = list(centroids)
        sizes = {cid: 0 for cid in range(k)}
        for cid in range(k):
            if agg_n[cid] > 0:
                new_centroids[cid] = (agg_sum[cid] / agg_n[cid]).tolist()
                sizes[cid] = int(agg_n[cid])
        shift = max(
            math.sqrt(sum((a - b2) ** 2 for a, b2 in zip(old, new)))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            converged = True
            break
    pts.unpersist()
    return KMeansResult(centroids, it, converged, wssse_history, sizes)


def assign_clusters_broadcast(
    spark: SparkSession,
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "vec",
) -> DataFrame:
    """assign_clusters for large k·dim: broadcast-join + argmin window
    instead of a compiled literal array.

    The literal-array form (assign_clusters) bakes k·dim doubles into the
    generated code — unbeatable for k·dim ≤ ~64k values, but codegen size
    grows linearly and eventually falls back to interpretation. This
    variant ships the full centroid list as ONE broadcast row holding an
    ARRAY<ARRAY<DOUBLE>>: points pick it up via a 1-row
    BroadcastNestedLoopJoin (no row fan-out, no shuffle), and the per-point
    argmin is an array higher-order expression over the k candidate
    vectors. This is literally the reference's op #7 (centroids shipped to
    every mapper in the RPC request, /root/reference/master.py:182-186) in
    plan form, minus the k-fold row explosion.

    Same contract as assign_clusters: adds cid/dist2, ties break toward the
    lowest cid (array_position returns the FIRST index of the min). Fully
    deterministic — no per-row ids, no self-join, so retried tasks or
    reshuffled inputs cannot diverge between plan branches.
    """
    cents = spark.createDataFrame(
        [([list(map(float, vec)) for vec in centroids],)],
        "cvecs ARRAY<ARRAY<DOUBLE>>",
    )
    dists = F.transform(F.col("cvecs"), lambda c: sq_euclidean(F.col(vec_col), c))
    return (
        df.join(F.broadcast(cents))
        .withColumn("_d", dists)
        .withColumn("dist2", F.array_min("_d"))
        .withColumn("cid", (F.array_position(F.col("_d"), F.col("dist2")) - 1).cast("int"))
        .drop("cvecs", "_d")
    )
