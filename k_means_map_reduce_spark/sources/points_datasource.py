"""Spark 4 Python DataSource for the reference's points.txt format.

`points_txt.read_points_txt` parses the format declaratively over
`spark.read.text`; this module implements the SAME format as a first-class
`DataSource` (`spark.read.format("points_txt")`) — the modern extension
point for custom file formats, exercising the V2 read path: schema
declaration, byte-range partition planning, and per-partition iterators.

Why both exist: the expression reader is the production path (JVM-side,
codegen); a Python DataSource runs its `read()` in Python workers — the
right tool when the FORMAT needs Python to decode (proprietary encodings,
odd containers), which is also why the multimodal codecs would live behind
this API in a real deployment. Reference format: one point per line,
comma-separated floats, optional spaces (reference mapper.py parses the
same shape).

Partition planning mirrors what Hadoop text splits do: the file is split
into ~equal byte ranges, each range is aligned to line boundaries at read
time by the "skip the first partial line unless at offset 0, read through
the end of the line that crosses the range end" rule — so every line lands
in exactly one partition and partitions need no coordination.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Range(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class PointsTxtReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("points_txt: a path is required")
        self.n_splits = int(options.get("numpartitions", "4"))

    def partitions(self):
        size = os.path.getsize(self.path)
        n = max(1, min(self.n_splits, size))
        step = (size + n - 1) // n
        return [
            _Range(self.path, i * step, min((i + 1) * step, size)) for i in range(n)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        with open(partition.path, "rb") as f:
            f.seek(partition.start)
            if partition.start > 0:
                f.readline()  # partial line: owned by the previous range
            while f.tell() <= partition.end:
                line = f.readline()
                if not line:
                    break
                text = line.decode("utf-8").strip()
                if text:
                    yield ([float(p.strip()) for p in text.split(",")],)
                # a line that STARTS at or before `end` is ours even if it
                # crosses it; the loop condition checks the position BEFORE
                # the next read, so the crossing line was already consumed.
                if f.tell() > partition.end:
                    break


class PointsTxtDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "points_txt"

    def schema(self) -> str:
        return "coordinates ARRAY<DOUBLE>"

    def reader(self, schema) -> PointsTxtReader:
        return PointsTxtReader(self.options)


def register(spark) -> None:
    """Idempotent registration: spark.read.format('points_txt') afterwards."""
    spark.dataSource.register(PointsTxtDataSource)
