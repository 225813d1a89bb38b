"""getdbt_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the full query surface of the reference
project ``hvandijknpo/getdbt`` (a dbt/BigQuery analytics pipeline for
the Dutch public broadcaster NPO): its relational operator inventory,
scalar-function semantics, model-DAG runner with incremental
partition-overwrite materialization, plus large-scale training-data
pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing).

Architecture (SURVEY.md §7):
  - ``session``   SparkSession factory (TZ, AQE, dynamic partition overwrite)
  - ``io``        table loaders over the parquet test corpus
  - ``functions`` BigQuery→Spark gotcha-closing helper library
  - ``registry``  ``@model`` decorator + DAG (replaces dbt's Jinja ``ref()``)
  - ``runner``    view / table / incremental materializations
  - ``models``    the reference's 20-model DAG as DataFrame builders
  - ``queries``   operator inventory as oracle-checkable queries
  - ``pipeline``  dedup / similarity / text / multimodal operators
  - ``streaming`` Structured Streaming variant of the stream-stats model
  - ``snapshots`` SCD2 snapshot hook (dbt ``snapshots/``)
  - ``dq``        column-test runner (dbt ``tests/`` / schema.yml)
  - ``seeds``     declared-schema CSV seeds (dbt ``data/``)
  - ``scale``     skew-salting + bucketed co-location primitives
  - ``fixtures``  NPO-shaped source fixtures (dialect-common SQL)
  - ``api``       ``run`` / ``run_incremental`` / ``sql`` entry points
"""

__version__ = "0.1.0"
