"""Physical-plan inspection helpers.

The engine's performance contract is enforced in tests with these:
broadcast joins stay broadcast, filters reach the parquet scan,
whole-stage codegen covers the hot path. At 100 TB the difference
between a pushed and an unpushed filter is the whole job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted plan (empty string if
    nothing reached the scan)."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return "\n".join(out)


def num_shuffles(df: DataFrame) -> int:
    # executedPlan shows each Exchange once (formatted mode repeats them
    # in the detail section)
    return physical_plan(df).count("Exchange ")


def codegen_plan(df: DataFrame) -> str:
    """`explain("codegen")` output — AQE's pre-execution physical plan
    doesn't display WholeStageCodegen spans, this mode does."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    return buf.getvalue()
