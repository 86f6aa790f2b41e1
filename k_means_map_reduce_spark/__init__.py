"""k_means_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-Spark rebuild of the capabilities of the reference
engine (DeepanshuDabas03/K-Means_Map-Reduce: a hand-rolled gRPC MapReduce
K-Means, see /root/reference/master.py, mapper.py, reducer.py), generalized to
the full relational + LLM-data-pipeline surface mandated by SURVEY.md §2b.

Design rules (SURVEY.md §4):
- DataFrame/SQL everywhere; Catalyst + Tungsten pick the physical plan.
- No row-at-a-time Python UDFs on hot paths; array higher-order functions and
  pandas UDFs (Arrow) where Python is unavoidable.
- Broadcast small sides; single-shuffle aggregations; cache iterated inputs.
"""

__version__ = "0.1.0"
