"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo ``shanalishah/customer-revenue-analysis-sql-tableau``.

The reference (surveyed in ``/root/repo/SURVEY.md``) is a MySQL/Sakila
data-warehouse project: one analytical view (``customer_revenue_summary``,
``queries_shan.sql:7-42``), 11 warehouse queries (``queries_shan.sql:44-144``),
golden CSV outputs, and a Streamlit app. This package re-expresses every
operator that workload exercises as idiomatic Spark SQL / DataFrame code,
and extends it with LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns, streaming windows) designed for 100 TB
scale: broadcast dims, decimal-exact money, AQE, no per-row Python in hot
paths.

Layout:
    session.py    SparkSession factory (UTC, AQE, ANSI-safe confs)
    catalog.py    testdata table registration (parquet sources)
    functions/    portable (Spark + DuckDB) expression builders
    sources/      parquet/csv IO + MySQL-dump ingest for Sakila replay
    operators/    warehouse view, q1-q11, procedures, dedup, similarity, text
    streaming/    structured-streaming windows with batch twins
    (plan-shape assertions — broadcast, pushdown, codegen — live in
    tests/test_plan_quality.py)
"""

__version__ = "0.1.0"
