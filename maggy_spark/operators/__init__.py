"""Operator library: each module exposes OPERATORS, a list of
(name, spark_fn, oracle_sql_or_None) triples collected by
maggy_spark.registry."""
