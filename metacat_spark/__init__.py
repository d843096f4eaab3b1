"""metacat_spark — a PySpark-native metadata-catalog analytics engine.

Re-implements the query and data-processing capabilities of the
ivmfnal/metacat reference (MQL over JSONB in PostgreSQL) as Spark SQL /
DataFrame plans over columnar tables, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis).
"""

__version__ = "0.1.0"
