"""PySpark-native analytics engine.

A brand-new, Spark-first rebuild of the query and data-processing
capabilities of ut-cuip/utc-cuip-kafka-aws-connector (a Kafka -> S3
data-lake offloader; see /root/reference, SURVEY.md), extended with a
full relational operator surface, streaming operators, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns), all expressed on the DataFrame/SQL API so
Catalyst + Tungsten pick the physical strategy.
"""

from utc_cuip_kafka_aws_connector_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
