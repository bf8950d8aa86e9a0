"""olist_lakehouse_2_0_spark — a PySpark-native lakehouse/analytics engine.

A brand-new, idiomatic PySpark implementation of the capabilities of the
reference lakehouse (heitorfe/olist-lakehouse-2.0, a Databricks Lakeflow
Declarative Pipelines project): incremental ingestion, declarative data
quality expectations, cleanse/enrich/KPI query shapes, CDC SCD1/SCD2,
PII governance — plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Everything is DataFrame-API-first: logical plans are declared with
pyspark.sql and optimized by Catalyst/AQE; Python only orchestrates.
"""

from olist_lakehouse_2_0_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
