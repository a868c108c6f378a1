from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG, oracle_sql, queries

__all__ = ["CATALOG", "queries", "oracle_sql"]
