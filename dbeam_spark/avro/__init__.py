from dbeam_spark.avro.schema import spark_schema_to_avro
from dbeam_spark.avro.writer import write_avro

__all__ = ["spark_schema_to_avro", "write_avro"]
