"""modevetl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of klahnakoski/MoDevETL.

The reference (see SURVEY.md; /root/reference was empty at build time, so
citations are to the documented upstream layout, e.g.
``pyLibrary/queries/__init__.py``) is a single-process Python ETL engine
built around Qb / "JSON Query Expressions": select / edges / where / sort /
window over JSON documents, producing lists or dense cubes, plus
incremental pull -> transform -> bulk push ETL jobs.

This package re-expresses those semantics Spark-first:

- ``session``    — SparkSession factory tuned for the driver harness.
- ``sources``    — parquet catalog over the driver test tables; incremental
                   (high-water-mark) pull helpers.
- ``functions``  — scalar helpers + oracle-parity numeric compat layer.
- ``operators``  — dense cube / densify, transitive closure, window idioms,
                   dedup (exact/MinHash/SimHash/Jaccard/embedding),
                   similarity search, text analysis, multimodal plumbing.
- ``queries``    — the named query library that feeds __spark_entry__.py
                   (queries() + oracle_sql() driver contract).
- ``plans``      — the Qb-style JSON query language front-end (jx dialect)
                   translated to DataFrame plans.
- ``streaming``  — Structured Streaming forms of the incremental contract.
"""

__version__ = "0.1.0"
