"""omniengine_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the OmniLayer/omniEngine reference (a cron-driven
row-at-a-time Python/Postgres pipeline): event-sourced batch over
immutable bronze facts, typed silver ledgers, and gold state/rollup
tables — declared with the DataFrame API so Catalyst/Tungsten pick the
physical plan, and designed for 100 TB / 1000-executor scale.

Layout:
    session     — SparkSession factory with scale-tuned defaults
    sources     — table catalog / readers for parquet warehouses
    functions   — scalar column-expression library (SURVEY §2.8)
    operators   — relational + domain operators (SURVEY §2.2-2.7, §2.10)
    plans       — named end-to-end queries over the warehouse
    streaming   — incremental / structured-streaming shaped layer
"""

__version__ = "0.1.0"
