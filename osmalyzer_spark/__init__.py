"""osmalyzer_spark — a from-scratch PySpark-native spatial cross-reference engine.

Reproduces the query/data-processing capabilities of OSMLatvija/Osmalyzer
(reference at /root/reference, C#/.NET) as distributed DataFrame jobs:
cell-indexed kNN matching, point-in-polygon joins, the Correlator
mutual-best assignment, tile assignment, tag filters/groupings, GTFS-style
relational analytics — plus training-data-pipeline operators (dedup,
similarity search, text stats, multimodal plumbing).

Design blueprint: SURVEY.md at the repo root. This package is NOT a port of
the reference's single-process object graph; it is an idiomatic Spark
engine (DataFrame/Catalyst-first, Arrow-vectorized UDFs only where built-in
expressions cannot express the semantics).
"""

__version__ = "0.1.0"
