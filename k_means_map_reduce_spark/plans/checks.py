"""Physical-plan quality checks (SURVEY.md §4, M5).

The scale contract this engine makes — filters reach the parquet scan,
column pruning happens, joins broadcast where intended, nothing falls back to
row-at-a-time Python — is checkable from the formatted physical plan. These
helpers turn those properties into assertions so a regression (e.g. a UDF
sneaking into a hot path and breaking whole-stage codegen) fails tests, not
a 100 TB run.
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanReport:
    text: str
    has_python_row_udf: bool
    has_pandas_udf: bool
    n_codegen_stages: int
    broadcast_joins: int
    sortmerge_joins: int
    pushed_filters: bool
    read_schemas: list[str] = field(default_factory=list)


def plan_report(df: DataFrame, execute: bool = False) -> PlanReport:
    """Inspect df's physical plan. With execute=True the query runs first so
    AQE finalizes (isFinalPlan=true) — required to see WholeStageCodegen
    markers and runtime-chosen join strategies."""
    if execute:
        df.collect()  # collect() finalizes THIS df's AQE plan (count() would execute a different one)
    text = explain_str(df, "formatted")
    read_schemas = [
        line.split("ReadSchema:", 1)[1].strip()
        for line in text.splitlines()
        if "ReadSchema:" in line
    ]
    return PlanReport(
        text=text,
        has_python_row_udf="BatchEvalPython" in text,
        has_pandas_udf="ArrowEvalPython" in text,
        n_codegen_stages=len(set(re.findall(r"\[codegen id : (\d+)\]", text))),
        broadcast_joins=text.count("BroadcastHashJoin")
        + text.count("BroadcastNestedLoopJoin"),
        sortmerge_joins=text.count("SortMergeJoin"),
        pushed_filters="PushedFilters: [" in text
        and any(
            "PushedFilters: []" not in line
            for line in text.splitlines()
            if "PushedFilters:" in line
        ),
        read_schemas=read_schemas,
    )


def assert_no_python_row_udf(df: DataFrame, name: str = "") -> None:
    r = plan_report(df)
    assert not r.has_python_row_udf, (
        f"{name}: BatchEvalPython (row-at-a-time Python UDF) in the plan — "
        "hot path fell off whole-stage codegen:\n" + r.text
    )
