"""Priority scheduling across concurrent streaming queries
(reference R21 parity, run.py:87-115).

The reference dedicated half its worker processes to the vision topic.
The Spark-native equivalent is the fair scheduler: each streaming
query starts inside its own scheduler pool, and pool weights give the
latency-critical topic a guaranteed share of task slots without
starving the rest -- no process management, no shared-queue
back-pressure tuning (run.py:85's Queue(8)).

Pool weights/minShare come from a fairscheduler.xml allocation file
(spark.scheduler.allocation.file) on a real cluster; the helper here
only tags the thread so its jobs land in the named pool.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scheduler_pool(spark: SparkSession, pool: str):
    """Run the enclosed query-starts inside a named fair-scheduler
    pool. Example:

        with scheduler_pool(spark, "vision"):
            q_vision = vision_stream.writeStream...start()
        with scheduler_pool(spark, "default"):
            q_air = air_stream.writeStream...start()
    """
    sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", pool)
    try:
        yield
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)
