"""Event-stream analytics walkthrough: the batch events family end to
end — daily activity, as-of attribution, sessionization, trailing
features, the ordered funnel with its lag histogram, cohort retention,
and RFM tiers.

Run: python examples/events_analytics.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-events-analytics")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.operators.events import (
        ev2_daily_activity,
        ev4_asof_attribution,
        ev5_sessionize,
        ev6_trailing_features,
        ev7_conversion_funnel,
        ev8_cohort_retention,
        ev9_conversion_lag,
        ev10_rfm_segments,
    )

    print("-- daily activity (ev2)")
    ev2_daily_activity(spark, sf_dir).orderBy("day").show(5)

    print("-- as-of click attribution for purchases (ev4): no future leakage")
    ev4 = ev4_asof_attribution(spark, sf_dir)
    ev4.select(F.count("*").alias("attributed"), F.max("gap_us").alias("max_gap_us")).show()

    print("-- 30-minute-gap sessions (ev5)")
    ev5_sessionize(spark, sf_dir).groupBy().agg(
        F.count("*").alias("n_sessions"),
        F.avg("n_events").alias("avg_events_per_session"),
        F.max("duration_us").alias("longest_us"),
    ).show()

    print("-- leakage-free trailing click features at purchase time (ev6)")
    ev6_trailing_features(spark, sf_dir).show(5)

    print("-- ordered view->click->purchase funnel (ev7) + lag histogram (ev9)")
    ev7_conversion_funnel(spark, sf_dir).orderBy("stage").show()
    ev9_conversion_lag(spark, sf_dir).orderBy("lag_kind", "lag_hours").show(10)

    print("-- cohort retention triangle (ev8)")
    ev8_cohort_retention(spark, sf_dir).where("day_offset <= 2").orderBy(
        "cohort_day", "day_offset"
    ).show(9)

    print("-- RFM user tiers (ev10)")
    ev10_rfm_segments(spark, sf_dir).groupBy("segment").agg(
        F.count("*").alias("n_users"),
        F.avg("frequency").alias("avg_frequency"),
        F.avg("monetary").alias("avg_monetary"),
    ).orderBy("segment").show()

    print("-- feed-volume anomalies: days > 3 trailing sigmas (ev11)")
    from maggy_spark.operators.events import ev11_volume_anomaly

    ev11_volume_anomaly(spark, sf_dir).where("is_anomaly").orderBy(
        "event_type", "day"
    ).show(10)


if __name__ == "__main__":
    main()
