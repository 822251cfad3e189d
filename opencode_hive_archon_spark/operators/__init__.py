"""Operator modules — each exposes `(spark, sf_dir) -> DataFrame` queries.

Every public query function here is registered in the engine registry
(opencode_hive_archon_spark.registry) together with its DuckDB oracle SQL,
and surfaced through ``__spark_entry__.queries()`` / ``oracle_sql()``.
"""
