"""PySpark-native analytics engine with the query/data-processing capabilities of
SainsburyWellcomeCentre/aeon_sleap_processing (see SURVEY.md).

Built Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with a
small set of Arrow-batched ``applyInPandas`` kernels for the genuinely sequential
per-event algorithms (Hungarian assignment, identity-swap correction).

Layout:
- ``session``    — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``schema``     — StructTypes + experiment→schema registry (SURVEY §1.3/§1.5)
- ``sources``    — chunk-pruned scans, catalog of test tables, HARP ingest
- ``operators``  — temporal kit (as-of join, sessionize, interval filter, ...),
                   dedup / similarity / text-analysis operators, stateful kernels
- ``functions``  — kinematics + geometry + hashing column expressions
- ``plans``      — end-to-end pipelines (tube test, fight, pose+ID combine)
- ``streaming``  — incremental chunk-watch mode (Structured Streaming)
"""

__version__ = "0.1.0"
