"""yelpdatawarehouse_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities of
the reference warehouse (Siverteh/YelpDataWarehouse, surveyed in SURVEY.md)
as an idiomatic Spark engine:

* ``sources``    — table catalogs, explicit schemas, JSON entity readers
                   (reference: init/*_loader.py ETL surface).
* ``operators``  — join/aggregate/window/pagination/graph/dedup/similarity
                   operator library (reference: webapp/*_routes.py queries).
* ``functions``  — scalar function layer (hashing, text, vectors, datetime)
                   built exclusively from JVM-side pyspark.sql.functions.
* ``plans``      — dynamic query assembly (the reference builds SQL strings
                   from request params; we compose Column predicates).
* ``streaming``  — Structured Streaming ingestion + incremental summary
                   maintenance (reference: streaming/consumer.py).
* ``queries``    — the public query surface: every operator from SURVEY.md §2
                   expressed over the harness tables, each with a matching
                   ANSI-SQL oracle.
* ``multimodal`` — opaque-binary column handling (decode stubs, real Spark
                   plumbing).

Design rules (100 TB first):
  - DataFrame/SQL only; no RDDs; no driver-side loops over facts.
  - Broadcast dimensions, shuffle facts on their join keys only.
  - All hash-based operators use md5-derived 60-bit integers so results are
    reproducible in any ANSI SQL engine (correctness oracles).
  - Floating aggregates are rounded at the presentation edge.
"""

__version__ = "0.1.0"
