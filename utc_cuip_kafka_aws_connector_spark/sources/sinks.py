"""Partitioned batch/streaming sinks.

Reproduces the reference's at-rest layout -- Hive-style
``<entity>/year=YYYY/month=M/`` (df_manager.py:82-84, 101-103) -- via
``partitionBy``, and replaces its O(file^2) read-modify-write CSV
append (df_manager.py:86-92, bug B3) with either a plain append
(at-least-once, same guarantee as the reference) or an epoch-keyed
idempotent writer for exactly-once under streaming replay
(SURVEY §4.3).

The local ``./cache`` duplicate of the reference (df_manager.py:92)
intentionally has no equivalent: executors + atomic commit protocols
replace it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_partition_columns(df: DataFrame, ts_col: str = "timestamp_iso") -> DataFrame:
    """Derive calendar partition columns. Closed-open by construction
    (fixes reference bug B1: the string-range month filter in
    df_manager.py:69-75 silently dropped month-boundary rows)."""
    return df.withColumn("year", F.year(ts_col)).withColumn("month", F.month(ts_col))


def _save_partitioned(clustered: DataFrame, path: str, entity_col: str, fmt: str, mode: str) -> None:
    writer = (
        clustered.write.partitionBy(entity_col, "year", "month")
        .option("maxRecordsPerFile", 5_000_000)
        .mode(mode)
        .format(fmt)
    )
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    entity_col: str,
    ts_col: str = "timestamp_iso",
    fmt: str = "parquet",
    mode: str = "append",
) -> None:
    """R18: partitioned sink, ``<path>/<entity>=<v>/year=Y/month=M/``.

    At 100 TB the partition columns give read-time partition pruning
    for free; parquet is the default at-rest format (columnar,
    predicate pushdown) with CSV kept for reference byte-compatibility.
    """
    part = with_partition_columns(df, ts_col)
    # Cluster rows by their target partition before the write: without
    # this every task writes a file into every partition dir
    # (tasks x partitions small files -- the classic scale failure).
    # maxRecordsPerFile re-splits genuinely hot partitions.
    clustered = part.repartition(F.col(entity_col), F.col("year"), F.col("month"))
    _save_partitioned(clustered, path, entity_col, fmt, mode)


def dual_destination_write(
    df: DataFrame,
    primary_path: str,
    backup_path: str,
    entity_col: str,
    ts_col: str = "timestamp_iso",
    fmt: str = "parquet",
    mode: str = "append",
) -> None:
    """Reference df_manager.py:82-103 parity: every flush lands in TWO
    buckets (primary + backup). The partition-clustered frame is
    computed ONCE and persisted, then written to both destinations --
    the second write re-reads executor-local persisted blocks instead
    of re-scanning and re-shuffling the source, which at 100 TB halves
    the cost of the mirror. DISK_ONLY, not MEMORY: the frame is an
    entire flush (arbitrarily large vs executor storage memory), local
    disk read-back is far cheaper than re-shuffling, and memory
    pressure would evict blocks and silently recompute anyway."""
    from pyspark import StorageLevel

    part = with_partition_columns(df, ts_col)
    clustered = part.repartition(
        F.col(entity_col), F.col("year"), F.col("month")
    ).persist(StorageLevel.DISK_ONLY)
    try:
        _save_partitioned(clustered, primary_path, entity_col, fmt, mode)
        _save_partitioned(clustered, backup_path, entity_col, fmt, mode)
    finally:
        clustered.unpersist()


def cloud_committer_conf() -> dict[str, str]:
    """SparkSession conf for writing the lake to an object store
    (``s3a://`` outputs, reference df_manager.py:82-84). S3 has no
    atomic directory rename, so the default FileOutputCommitter v1/v2
    is either slow (copy-on-rename) or unsafe (partial results on
    task failure); the S3A "magic" committer stages task output as
    uncompleted multipart uploads and completes them atomically at
    job commit. These keys are config, not code -- pass them to
    session.get_spark(extra_conf=...) on a cluster with the
    hadoop-aws + spark-hadoop-cloud jars (not bundled in this image,
    so local tests assert the contract, and writes here use
    ``file://``)."""
    return {
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
        ),
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
    }


def compact_small_files(
    spark,
    src_path: str,
    dest_path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Lake maintenance: rewrite a Hive-partitioned parquet dataset so
    each partition's many small files (the inevitable residue of
    frequent streaming flushes, reference R7's five-minute cadence)
    merge into ~``target_file_bytes`` files. Small files are the #1
    silent scan-cost multiplier at 100 TB: per-file open/footer
    overhead, tiny row groups defeating column-chunk IO, and listing
    storms.

    Scale design -- ONE job, ONE shuffle, no driver-side loop over
    partitions: per-leaf-directory byte sizes come from a filesystem
    listing (metadata-only, the object store/namenode does this
    anyway); each row joins (broadcast) its leaf's target file count
    ``n_target = ceil(bytes / target)``, gets a salt in
    ``[0, n_target)``, and one ``repartition(total_targets,
    partition_cols..., salt)`` clusters every output file's rows
    together. ``partitionBy`` then lands ~n_target files per
    partition.

    Writes to ``dest_path`` rather than in place: Spark cannot safely
    overwrite a path it is lazily reading, and on object stores the
    swap is a cheap table-location/pointer flip while in-place rewrite
    of a live prefix is not atomic. Returns a stats DataFrame
    (leaf, bytes, files_before, files_target) for observability.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = root.getFileSystem(hconf)
    per_leaf: dict[str, list[int]] = {}
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith("_") or name.startswith("."):
            continue
        leaf = p.getParent().toString()
        acc = per_leaf.setdefault(leaf, [0, 0])
        acc[0] += st.getLen()
        acc[1] += 1
    import re

    # Path.toString and input_file_name disagree on URI slash count
    # ("file:/x" vs "file:///x"); normalize both sides to a bare path.
    def _norm(p: str) -> str:
        return re.sub(r"^[a-z0-9]+:/+", "/", p)

    stats = [
        (_norm(leaf), b, n, max(1, -(-b // target_file_bytes)))
        for leaf, (b, n) in sorted(per_leaf.items())
    ]
    targets = spark.createDataFrame(
        stats, "leaf string, bytes long, files_before int, files_target int"
    )

    df = spark.read.parquet(src_path)
    # input_file_name is URI-formed ("file:/..."); the listing yields
    # the same URI form from Path.toString on the same filesystem.
    leaf_of_row = F.regexp_replace(
        F.regexp_replace(F.input_file_name(), "/[^/]*$", ""), "^[a-z0-9]+:/+", "/"
    )
    total_targets = sum(s[3] for s in stats) or 1
    clustered = (
        df.withColumn("__leaf", leaf_of_row)
        # LEFT join + coalesce(1): a path-form mismatch must degrade to
        # "one file for that partition", never drop rows.
        .join(
            F.broadcast(targets.select(F.col("leaf").alias("__leaf"), "files_target")),
            "__leaf",
            "left",
        )
        # The salt must be DETERMINISTIC under task recomputation: a
        # shuffle-fetch failure replays lost map tasks, and a salt from
        # spark_partition_id()/monotonically_increasing_id() can send
        # the replayed rows to different reducers than the lost output
        # -- silent duplication/loss (the SPARK-23207 class of bug,
        # which Spark guards round-robin repartition against but not a
        # user-supplied nondeterministic key). Hashing row CONTENT
        # gives the same salt on every recomputation; duplicate rows
        # colliding into one target file only skews layout, not data.
        .withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.coalesce(F.col("files_target"), F.lit(1)),
            ),
        )
        .repartition(total_targets, *partition_cols, F.col("__salt"))
        .drop("__leaf", "__salt", "files_target")
    )
    clustered.write.partitionBy(*partition_cols).mode("overwrite").parquet(dest_path)
    return targets


def idempotent_batch_writer(
    path: str,
    entity_col: str,
    ts_col: str = "timestamp_iso",
    fmt: str = "parquet",
):
    """foreachBatch sink function: exactly-once-style append without a
    transaction log (Delta jars are not in this image).

    Each micro-batch writes to a deterministic ``batch_id=<epoch>``
    subdirectory with mode=overwrite: re-running a batch after failure
    overwrites the same files instead of duplicating rows, making the
    sink idempotent under Structured Streaming's replay (SURVEY §4.3
    row 1). Readers glob ``<path>/batch_id=*`` and still get
    entity/year/month pruning below it.
    """

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        writer = (
            with_partition_columns(df, ts_col)
            .write.partitionBy(entity_col, "year", "month")
            .mode("overwrite")
            .format(fmt)
        )
        if fmt == "csv":
            writer = writer.option("header", True)
        writer.save(f"{path}/batch_id={epoch_id}")

    return write_batch
