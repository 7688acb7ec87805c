"""Shared helpers for oracle-checked queries (re-exported from
functions.determinism, the engine-level home)."""

from ..functions.determinism import (  # noqa: F401
    DEC,
    collect_literal_row,
    davg,
    dsum,
    literal_row,
    sql_davg,
    sql_dsum,
)
