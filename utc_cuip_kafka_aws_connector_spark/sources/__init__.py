from utc_cuip_kafka_aws_connector_spark.sources.batch import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
