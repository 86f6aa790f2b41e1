"""Reader/writer for the reference engine's own text formats.

Input format (/root/reference/Data/Input/points.txt, parsed at
/root/reference/mapper.py:21): one point per line, comma(+optional space)
separated doubles. The reference *mutates the input file* with a regex to
force `", "` separators before parsing (handlePoints,
/root/reference/master.py:78-87). Here: schema-on-read — split on comma,
trim, cast; the source is never touched, and the reader is N-dimensional
(the reference hard-codes 2-D, mapper.py:27-28).

Output format (/root/reference/master.py:72-75): centroids as comma-joined
coordinates, one per line, ids dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_points_txt(spark: SparkSession, path: str) -> DataFrame:
    """Text scan → (coordinates ARRAY<DOUBLE>). Splits on ',' and trims each
    field, so both `1,2` and `1, 2` parse — no input mutation (reference
    ops #1-#3 collapsed into one declarative read)."""
    return (
        spark.read.text(path)
        .where(F.trim("value") != "")
        .select(
            F.transform(
                F.split("value", ","), lambda s: F.trim(s).cast("double")
            ).alias("coordinates")
        )
    )


def write_centroids_txt(centers: list[list[float]], path: str) -> None:
    """Driver-side write of the final (small, k rows) centroid set in the
    reference's output format (master.py:72-75: comma-joined coords, no id).
    k is tiny by construction — this is deliberately not a distributed write."""
    with open(path, "w") as f:
        for vec in centers:
            f.write(",".join(str(float(x)) for x in vec) + "\n")


def read_centroids_txt(path: str) -> list[list[float]]:
    with open(path) as f:
        return [
            [float(x) for x in line.strip().split(",")]
            for line in f
            if line.strip()
        ]
