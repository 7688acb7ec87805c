"""Pipeline orchestration: the reference's run loop, Spark-first.

Parity with framework.py:13-39 in /root/reference —
read → audit columns → RAW append → to_hub → HUB upsert per enabled
source — with the reference's known wart fixed: it executed two
actions against an uncached plan, scanning every source twice (and
re-evaluating current_timestamp between zones). We cache between the
RAW and HUB writes and unpersist after.

Audit columns (framework.py:27-32 semantics):
- _source_id     constant per source
- _ingest_ts_utc current_timestamp() at plan execution
- ingest_date    ISO date STRING (driver-computed once per run — a
                 string, not DateType, matching the reference's RAW
                 partition layout), injectable for deterministic tests.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import Config
from .metadata import Source, SourceSystem, load_sources
from .sources import get_reader
from .transform import to_hub
from .writer import write_hub, write_raw


def add_audit_columns(
    df: DataFrame, source: Source, ingest_date: str | None = None
) -> DataFrame:
    ingest_date = ingest_date or dt.datetime.now(dt.timezone.utc).date().isoformat()
    return (
        df.withColumn("_source_id", F.lit(source.id))
        .withColumn("_ingest_ts_utc", F.current_timestamp())
        .withColumn("ingest_date", F.lit(ingest_date))
    )


CORRUPT_COL = "_corrupt_record"


def quarantine_malformed(
    df: DataFrame, source: Source, cfg: Config
) -> DataFrame:
    """Split off rows a PERMISSIVE read flagged as malformed.

    When the source schema captures parse failures in
    ``_corrupt_record`` (csv/json `columnNameOfCorruptRecord`), those
    rows are appended to the quarantine zone — partitioned like RAW,
    keeping the raw malformed payload for replay after a schema fix —
    and only clean rows continue to RAW/HUB. Without the column this
    is a no-op, preserving the reference's permissive behavior.
    """
    if CORRUPT_COL not in df.columns:
        return df
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    write_raw(
        bad,
        f"{cfg.quarantine_base}/{source.domain}/{source.entity}",
        source.raw_partitions,
    )
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def run_source(
    spark: SparkSession,
    source: Source,
    cfg: Config,
    ingest_date: str | None = None,
) -> None:
    reader = get_reader(source.type)
    df = reader(spark, source.options)
    df = add_audit_columns(df, source, ingest_date)
    df = quarantine_malformed(df, source, cfg)

    # one physical scan feeds both zone writes
    df = df.cache()
    try:
        write_raw(
            df,
            f"{cfg.raw_base}/{source.domain}/{source.entity}",
            source.raw_partitions,
        )
        hub_df = to_hub(df, source)
        write_hub(
            spark,
            hub_df,
            f"{cfg.hub_base}/{source.domain}/{source.entity}",
            source.hub_primary_keys,
            checkpoint_base=cfg.checkpoint_base,
            source_id=source.id,
        )
    finally:
        df.unpersist()


def run(
    spark: SparkSession,
    sources_yaml: str,
    env: str = "local",
    ingest_date: str | None = None,
) -> list[str]:
    """Ingest every enabled source; returns the ids that ran."""
    ss: SourceSystem = load_sources(sources_yaml)
    cfg = Config.from_defaults(ss.defaults, env=env)
    ran: list[str] = []
    for source in ss.sources:
        if not source.enabled:
            continue
        run_source(spark, source, cfg, ingest_date)
        ran.append(source.id)
    return ran
