"""tutorial_apache_beam_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo jessee-kung/tutorial-apache-beam (an Apache Beam tutorial with
two streaming click-analytics pipelines), re-expressed Spark-first:

- batch + streaming relational layer on the DataFrame / SQL API (Catalyst
  optimizes; we declare logical plans only),
- a thin Beam-equivalent pipeline API (``plans.pipeline``) so the reference's
  Demo1/Demo2 programs can be written nearly verbatim,
- Structured Streaming execution with watermark-based lateness handling
  (``streaming``),
- LLM-data-pipeline extension operators: dedup, similarity search, text
  analysis, multimodal column plumbing (``operators``).

Everything here derives from public knowledge: the Apache Spark / PySpark
API and docs, and the behavior of the reference pipelines.
"""

from tutorial_apache_beam_spark.session import get_spark
from tutorial_apache_beam_spark.catalog import TABLES, load_table, load_tables

__all__ = ["get_spark", "TABLES", "load_table", "load_tables"]

__version__ = "0.1.0"
