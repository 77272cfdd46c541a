from maggy_spark.plans.fixtures import (
    DUCKDB_FIXTURE_CTES,
    load_table,
    metrics_df,
    metrics_raw_df,
    trials_df,
    with_fixtures,
)

__all__ = [
    "DUCKDB_FIXTURE_CTES",
    "load_table",
    "metrics_df",
    "metrics_raw_df",
    "trials_df",
    "with_fixtures",
]
