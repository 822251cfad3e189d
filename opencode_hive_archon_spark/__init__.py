"""opencode_hive_archon_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference retrieval engine
(``ryanjosebrosas/opencode-hive-archon``, surveyed in SURVEY.md), extended
with the relational / LLM-data-pipeline / streaming operator families the
north star mandates.

Design stance (SURVEY.md §7): declare logical plans with the DataFrame/SQL
API and let Catalyst + Tungsten pick physical strategies. Python UDFs only
where built-ins genuinely cannot express the semantics (Arrow-batched
pandas UDFs, never row-at-a-time in hot paths).
"""

from opencode_hive_archon_spark.session import get_spark, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]

__version__ = "0.1.0"
