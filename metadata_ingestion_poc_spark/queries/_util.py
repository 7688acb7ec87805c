"""Shared helpers for oracle-checked queries (re-exported from
functions.determinism, the engine-level home)."""

from ..functions.determinism import (  # noqa: F401
    DEC,
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
