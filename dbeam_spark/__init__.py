"""dbeam_spark — a PySpark-native engine with the capabilities of
spotify/dbeam (JDBC → Avro export) plus large-scale analytics and
LLM-data-pipeline operators.

Reference parity map lives in SURVEY.md §2; each module docstring cites
the reference file it re-expresses (Spark-first, not a port).
"""

__version__ = "0.1.0"
