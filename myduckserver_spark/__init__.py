"""myduckserver_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of apecloud/myduckserver, re-expressed
Spark-first (Catalyst/Tungsten execution over Parquet), plus the
LLM-data-pipeline operators (dedup, similarity, text analysis,
multimodal) designed for 100 TB scale.
"""

from myduckserver_spark.session import build_session
from myduckserver_spark.tables import load_table, register_views

__all__ = ["build_session", "load_table", "register_views"]
