"""metadata_ingestion_poc_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference ``marpemad/metadata_ingestion_poc`` (a metadata-driven
PySpark+Delta ingestion framework, see SURVEY.md), extended with the
relational / window / text / dedup / similarity operator surface a
large-scale training-data pipeline needs.

Design stance: declare logical plans with the DataFrame/SQL API and let
Catalyst + Tungsten pick the physical strategy. Python stays on the
control plane; data-plane work is JVM-side built-ins, with Arrow-batched
pandas UDFs only where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
