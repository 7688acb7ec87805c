"""HUB standardization hook.

Parity with the reference's to_hub (transform.py:5-9 in
/root/reference — an identity transform with a commented column-select
scaffold). Here the hook is driven by metadata: if the source declares
``options['hub_columns']`` the frame is projected to those columns,
otherwise it passes through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .metadata import Source


def to_hub(df: DataFrame, source: Source) -> DataFrame:
    cols = source.options.get("hub_columns")
    if cols:
        return df.select(*cols)
    return df
