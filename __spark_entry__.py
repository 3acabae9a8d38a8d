"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md section 2 (plus the
training-data extension operators); ``oracle_sql()`` gives the DuckDB
equivalent for each (omitted only for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from confluent_data_ingestion_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's signature pipeline shape on sf0.001 —
    envelope view -> XREF latest-by-key -> FGAC enrichment join + masking."""
    from pyspark.sql import functions as F

    from confluent_data_ingestion_spark.operators import (
        json_view,
        latest_by_key,
        lookup_join,
        mask_columns,
    )
    from confluent_data_ingestion_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    t = load_tables(spark, sf_dir, ["events", "customer"])
    view = json_view(
        t["events"].filter(F.col("event_type").isin("purchase", "signup")),
        [("k", "k", "INT")],
        payload_col="props",
        keep_cols=["event_id", "user_id", "ts", "value"],
    )
    xref = latest_by_key(view, ["user_id"], ["ts", "event_id"])
    fgac = lookup_join(
        xref, t["customer"], "s.user_id = j.c_custkey",
        join_type="LEFT", broadcast=True,
    ).select("user_id", "event_id", "k", "value", "c_name", "c_mktsegment")
    return mask_columns(fgac, {"c_name": "sha2"})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
