"""Training-consumer export formats and point-lookup write options.

Two small write-path operators that round out the lake surface:

- ``export_jsonl`` — gzip'd JSON-lines shards, the lingua franca of
  training dataloaders (every public corpus ships as *.jsonl.gz).
  One JVM projection (``to_json`` over a struct of the selected
  columns) into the text sink with the gzip codec; shard count via
  ``repartition`` on a hash of the id (deterministic placement) or
  the caller's pre-partitioning. Round-trips through
  ``spark.read.json`` schema-stable.
- ``write_bloom_filtered`` — parquet with BLOOM FILTERS on chosen
  columns (`parquet.bloom.filter.enabled#col`), the third skipping
  dimension beside partition pruning and min/max stats
  (operators/tableread.py): min/max prunes RANGES on clustered
  columns; a bloom filter prunes EQUALITY lookups on high-cardinality
  UNCLUSTERED columns (user ids, URL hashes), where min/max spans
  everything and never excludes a row group. Spark's vectorized
  parquet reader consults the filter on pushed-down ``=`` predicates
  automatically; the test pins that the filters physically exist in
  the footers (pyarrow metadata) and that reads stay row-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    compression: str = "gzip",
) -> None:
    """Write ``df`` as JSON-lines text shards (default gzip). With
    ``n_shards`` rows are hash-distributed by id — deterministic
    shard membership, balanced by uniformity of the hash."""
    out = df
    if n_shards is not None:
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        out = df.repartition(n_shards, F.xxhash64(F.col(id_col)))
    (
        out.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.mode("overwrite")
        .option("compression", compression)
        .text(path)
    )


def write_bloom_filtered(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int = 100_000,
    **options,
) -> None:
    """Parquet write with bloom filters on ``bloom_cols`` sized for
    ``ndv`` distinct values per row group (~1.2 MB per column at 100k
    NDV / 1% FPP — footer weight, budget accordingly)."""
    if not bloom_cols:
        raise ValueError("bloom_cols must name at least one column")
    writer = df.write.mode("overwrite")
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        writer = writer.option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
        )
    writer.options(**options).parquet(path)


def bloom_filter_offsets(spark, file_path: str) -> dict[str, int]:
    """Per-column bloom-filter footer offsets of one parquet file
    (-1 = no filter), read through parquet-mr via the JVM gateway —
    pyarrow's metadata object does not surface bloom offsets, and
    verifying that the filters PHYSICALLY exist is exactly what the
    write-path test needs."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(file_path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        path, hconf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        out: dict[str, int] = {}
        blocks = reader.getFooter().getBlocks()
        for b in range(blocks.size()):
            cols = blocks.get(b).getColumns()
            for i in range(cols.size()):
                col = cols.get(i)
                name = col.getPath().toDotString()
                off = col.getBloomFilterOffset()
                out[name] = max(out.get(name, -1), off)
        return out
    finally:
        reader.close()
