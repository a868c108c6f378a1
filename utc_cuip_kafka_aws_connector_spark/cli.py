"""CLI entry point (reference R24 parity, run.py:134-264).

The reference parsed argv by hand, validated AWS env vars, loaded a
YAML config, and launched consumer processes. Here the equivalent is
an argparse front-end over the declarative pipeline, three modes:

- ``ingest``: one topic's JSON lines -> topic-family normalization ->
  Hive-partitioned sink, unknown topics quarantined (R19 fixed:
  routed, not dropped).

      python -m utc_cuip_kafka_aws_connector_spark ingest \
          --topic cuip_vision_events --input events.jsonl --output ./lake

- ``ingest-config``: the reference's main() (run.py:59-131) as ONE
  Spark job -- read the same config.yaml shape (kafka ->
  bootstrap-servers/group-id/topics, config.yaml:1-14), ingest every
  listed topic, route by family, write each family's partitioned
  lake and quarantine unknowns, in a single invocation. Worker
  pools/queues have no equivalent: Spark schedules the per-family
  plans across all cores.

      python -m utc_cuip_kafka_aws_connector_spark ingest-config \
          --config config.yaml --input-root ./incoming --output ./lake

- ``stream``: the reference's CRON consume->flush loop (README.md:5,
  run.py:117-125) as one Structured Streaming command: source ->
  normalize -> exactly-once partitioned sink via
  foreachBatch(idempotent_batch_writer), Trigger.AvailableNow (drain
  everything, then stop -- the cron cadence). A JSON file source
  stands in for Kafka here (spark-sql-kafka jars are not bundled);
  on a real cluster ``sources.kafka.kafka_reader`` yields the same
  (topic, value) shape and the rest of the command is unchanged.

      python -m utc_cuip_kafka_aws_connector_spark stream \
          --topic MLK_CENTRAL_AIR_QUALITY --input ./incoming \
          --output ./lake --checkpoint ./ckpt

S3 output works by pointing --output at s3a:// with fs.s3a.*
credentials configured on the cluster (instance profile preferred) --
no env-var checks in code, unlike the reference's hard exit
(run.py:224-248). ``--backup-output`` reproduces the reference's
dual-bucket write (df_manager.py:82-103) via
sinks.dual_destination_write.
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.pipeline import (
    AIR_MARKER,
    AIR_SCHEMA,
    VISION_SCHEMA,
    VISION_TOPIC,
    normalize_air,
    normalize_vision,
)
from utc_cuip_kafka_aws_connector_spark.sources.batch import read_json_lines
from utc_cuip_kafka_aws_connector_spark.sources.sinks import (
    dual_destination_write,
    idempotent_batch_writer,
    write_partitioned,
)


def _family(topic: str) -> str:
    if topic == VISION_TOPIC:
        return "vision"
    if AIR_MARKER in topic:
        return "air"
    return "dead_letter"


def _require_cols_absent(df: DataFrame, names: tuple[str, ...], stage: str) -> None:
    """The fence-split / para-dedup stages emit FIXED helper column
    names and the CLI wiring drops/renames them into the text column;
    an input corpus that already carries one of those names would be
    silently clobbered (or leave an ambiguous duplicate). Refuse
    loudly instead — the caller should rename their column first."""
    clash = [c for c in names if c in df.columns]
    if clash:
        raise SystemExit(
            f"{stage}: input already has column(s) {clash} which this "
            f"stage generates and consumes internally — rename them in "
            f"the input (or drop them) before running {stage}"
        )


def _write(df: DataFrame, output: str, entity: str, fmt: str, backup: str | None) -> None:
    if backup:
        dual_destination_write(df, output, backup, entity_col=entity, fmt=fmt)
    else:
        write_partitioned(df, output, entity_col=entity, fmt=fmt)


def run_ingest(
    spark: SparkSession,
    topic: str,
    input_path: str,
    output_path: str,
    fmt: str = "parquet",
    backup_output: str | None = None,
) -> str:
    """Batch-ingest one topic's JSON lines into the partitioned lake.
    Returns the route taken ('vision' | 'air' | 'dead_letter')."""
    family = _family(topic)
    if family == "vision":
        df = normalize_vision(read_json_lines(spark, input_path, VISION_SCHEMA))
        _write(df, output_path, "camera_id", fmt, backup_output)
    elif family == "air":
        df = normalize_air(read_json_lines(spark, input_path, AIR_SCHEMA))
        _write(df, output_path, "nicename", fmt, backup_output)
    else:
        # R19 dead-letter: quarantine raw lines instead of dropping
        spark.read.text(input_path).write.mode("append").text(
            f"{output_path}/dead_letter/{topic}"
        )
    return family


def load_topics_config(path: str) -> dict:
    """Load the reference-shaped config (config.yaml:1-14): top-level
    ``kafka`` list whose first entry carries bootstrap-servers,
    group-id, and the topic list. YAML when available, else JSON (the
    shapes are identical)."""
    with open(path) as fh:
        text = fh.read()
    try:
        import yaml

        cfg = yaml.safe_load(text)
    except ImportError:  # pragma: no cover - yaml is normally present
        import json

        cfg = json.loads(text)
    return cfg["kafka"][0]


def run_ingest_config(
    spark: SparkSession,
    config_path: str,
    input_root: str,
    output_path: str,
    fmt: str = "parquet",
    backup_output: str | None = None,
) -> dict[str, str]:
    """Ingest EVERY topic in the config in one invocation (reference
    main(), run.py:59-131): per-family inputs are unioned into one
    DataFrame each, normalized once, and written once -- so the
    air-quality family's 7 topics produce one partitioned write, not
    7, and Spark parallelizes across families without worker pools.
    Inputs are ``<input_root>/<topic>.jsonl``; topics with no input
    file are skipped (a consumer with no new messages). Returns
    {topic: route}.
    """
    topics = list(load_topics_config(config_path)["topics"])
    import os

    present = [t for t in topics if os.path.exists(f"{input_root}/{t}.jsonl")]
    routes = {t: _family(t) for t in present}

    vision = [t for t in present if routes[t] == "vision"]
    air = [t for t in present if routes[t] == "air"]
    dead = [t for t in present if routes[t] == "dead_letter"]

    if vision:
        frames = [
            read_json_lines(spark, f"{input_root}/{t}.jsonl", VISION_SCHEMA) for t in vision
        ]
        _write(
            normalize_vision(reduce(DataFrame.unionByName, frames)),
            f"{output_path}/vision",
            "camera_id",
            fmt,
            backup_output and f"{backup_output}/vision",
        )
    if air:
        frames = [
            read_json_lines(spark, f"{input_root}/{t}.jsonl", AIR_SCHEMA) for t in air
        ]
        _write(
            normalize_air(reduce(DataFrame.unionByName, frames)),
            f"{output_path}/air_quality",
            "nicename",
            fmt,
            backup_output and f"{backup_output}/air_quality",
        )
    for t in dead:
        spark.read.text(f"{input_root}/{t}.jsonl").write.mode("append").text(
            f"{output_path}/dead_letter/{t}"
        )
    return routes


def run_stream(
    spark: SparkSession,
    topic: str,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    sink: str = "epoch-dirs",
) -> None:
    """The reference's consume->flush CRON job as one streaming
    command: drain all available input (Trigger.AvailableNow), write
    through the epoch-keyed idempotent sink (exactly-once under
    replay -- the reference was at-least-once, SURVEY R23), track
    progress in the checkpoint. Re-running picks up only new files,
    exactly like the reference's committed Kafka offsets."""
    family = _family(topic)
    if family == "vision":
        schema, norm, entity = VISION_SCHEMA, normalize_vision, "camera_id"
    elif family == "air":
        schema, norm, entity = AIR_SCHEMA, normalize_air, "nicename"
    else:
        raise ValueError(f"unknown topic family for streaming: {topic}")

    if sink == "txlog":
        from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
            transactional_batch_writer,
        )

        batch_fn = transactional_batch_writer(output_path)
    else:
        batch_fn = idempotent_batch_writer(output_path, entity_col=entity, fmt=fmt)

    src = spark.readStream.schema(schema).json(input_dir)
    query = (
        norm(src)
        .writeStream.foreachBatch(batch_fn)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    query.awaitTermination()


def run_stream_curate(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    c4: bool = False,
    gopher: bool = False,
    hot_key_col: str | None = None,
    hot_k: int = 20,
    drift_ref: str | None = None,
    drift_cols: tuple[str, ...] = ("n_chars",),
    classifier_model: str | None = None,
    classifier_min_p: float = 0.5,
    compact_every: int = 16,
    near_dup_threshold: float = 0.0,
    langid_model: str | None = None,
    lang_col: str = "lang",
) -> None:
    """The reference's consume->flush CRON shape applied to the LLM
    curation tier (r12 VERDICT stretch): ONE AvailableNow streaming
    query whose ``foreachBatch`` runs the rule filters, exact dedup
    (within the batch AND against every prior batch), and the
    hot-key / drift monitors, all writing through epoch-keyed
    overwrite directories so replay after failure is exactly-once.

    Layout under ``output_path``:

      data/batch_id=<n>/           surviving documents
      _seen_hashes/batch_id=<n>/   md5(text) of every doc this batch
                                   KEPT (the cross-batch dedup state)
      _seen_compact/upto=<n>/      consolidated snapshot of every
                                   hash from batch_id < n (see below)
      _seen_bands/batch_id=<n>/    (--near-dup-threshold) LSH band
                                   rows of this batch's kept docs
      _seen_bands_compact/upto=<n>/  its consolidated snapshot
      _monitor/hotkeys/batch_id=<n>/  per-batch top-k of hot_key_col
      _monitor/drift/batch_id=<n>/    numeric_drift vs drift_ref
      _monitor/neardups/batch_id=<n>/  (--near-dup-threshold) every
                                   suppressed doc flagged to its
                                   surviving original: (doc, dup_of,
                                   sim)

    ``langid_model`` relabels ``lang_col`` with the char-n-gram NB
    identifier's predictions per micro-batch (after the rule/quality/
    classifier filters, before dedup) — batch/stream parity with
    ``curate-full --langid-model``, so the hot-key monitor and any
    downstream mixture see predicted languages.

    ``near_dup_threshold > 0`` adds cross-batch NEAR-duplicate
    suppression after the exact stage: each batch is LSH-banded
    (operators/increddup.py — the same MinHash construction as the
    batch dedup family) and matched against the band rows of every
    previously KEPT document; docs matching at or above the
    threshold are dropped and flagged to their originals. The band
    state lives in the same epoch-keyed layout as the hash state —
    same batch_id < n reads, same compaction, same replay
    determinism. Requires a numeric ``id_col``.

    Cross-batch dedup reads ONLY state from ``batch_id < n``: a
    replayed batch n sees exactly the state its first attempt saw
    (its own half-written hashes are invisible and get overwritten),
    so the kept-set is deterministic under replay — the txlog
    snapshot-isolation discipline without the log.

    State maintenance (r14, the ADVICE/VERDICT r13 growth fix):
    without it the anti-join's build side is one directory per batch
    forever, so listing + scan cost grows O(total batches) over the
    stream's lifetime. Every ``compact_every`` epochs the consumer
    consolidates all ``batch_id < n`` dirs into ONE write-once
    snapshot ``_seen_compact/upto=<n>`` and deletes the raw dirs, so
    live state is one snapshot + at most ``compact_every`` raw dirs.
    Crash-safe at every point: a snapshot only counts once its
    ``_SUCCESS`` marker exists, raw dirs are deleted only after that,
    older snapshots only after the newer one commits — and the hash
    SET a reader derives (largest committed snapshot <= n, plus raw
    dirs in [snapshot, n)) is identical at every intermediate state,
    so replay keeps exactly the same documents whether it lands
    before, during, or after a compaction. ``compact_every=0``
    disables maintenance (the pre-r14 unbounded layout)."""
    from utc_cuip_kafka_aws_connector_spark.operators.dedup import exact_dedup
    from utc_cuip_kafka_aws_connector_spark.operators.tableread import (
        _fs_and_path,
        _fs_read_text,
        _fs_write_text,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.text import quality_score

    data_dir = f"{output_path}/data"
    seen_dir = f"{output_path}/_seen_hashes"
    compact_dir = f"{output_path}/_seen_compact"
    bands_dir = f"{output_path}/_seen_bands"
    bands_compact_dir = f"{output_path}/_seen_bands_compact"
    ref = spark.read.parquet(drift_ref) if drift_ref else None
    lid = None
    if langid_model:
        # batch/stream parity with curate-full --langid-model: the
        # char-n-gram NB identifier, loaded ONCE on the driver,
        # relabels lang_col per micro-batch so the hot-key monitor
        # and any downstream mixture see predicted languages, not
        # (possibly absent/mislabeled) producer metadata
        from utc_cuip_kafka_aws_connector_spark.operators.langid import (
            langid_load,
        )

        lid = langid_load(spark, langid_model)
    clf = None
    if classifier_model:
        # the learned keep-vs-drop filter (lrquality), loaded ONCE on
        # the driver and applied per micro-batch — batch/stream
        # curation parity with curate-full --classifier-model
        from utc_cuip_kafka_aws_connector_spark.operators.lrquality import (
            lr_load,
        )

        clf = lr_load(classifier_model)

    def _numbered_children(path: str, prefix: str) -> list[tuple[int, object]]:
        # Hadoop FS of the path's OWN scheme: a driver-local glob
        # would silently disable cross-batch dedup on s3a://hdfs://
        # outputs (the skipread os.listdir lesson, ADVICE r8)
        fs, jpath, _ = _fs_and_path(spark, path)
        out = []
        if fs.exists(jpath):
            for st in fs.listStatus(jpath):
                name = st.getPath().getName()
                if name.startswith(prefix):
                    try:
                        out.append((int(name[len(prefix):]), st.getPath()))
                    except ValueError:
                        continue
        return out

    def _committed_upto(compact_root: str, epoch: int) -> int:
        # largest snapshot at-or-below this epoch whose _SUCCESS
        # marker exists; a torn snapshot write is invisible
        fs, _, jvm = _fs_and_path(spark, compact_root)
        best = 0
        for k, _p in _numbered_children(compact_root, "upto="):
            if best < k <= epoch and fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{compact_root}/upto={k}/_SUCCESS")
            ):
                best = k
        return best

    # the sidecar is immutable per snapshot dir: cache it (None too —
    # a sidecar absent for a given upto never appears later in this
    # process; only a NEW compaction writes a new one) so the driver
    # is not re-reading + re-decoding a multi-MB object per batch
    bloom_cache: dict[tuple[str, int], dict | None] = {}

    def _prior_state_parts(
        state_root: str, compact_root: str, epoch: int
    ) -> tuple[DataFrame | None, dict | None, DataFrame | None]:
        """(snapshot frame, snapshot bloom summary, raw-dirs frame)
        for everything a batch < epoch wrote: the largest committed
        snapshot plus the raw per-batch dirs in [snapshot, epoch).
        The derived SET is invariant under every compaction crash
        point, which is what makes replay keep exactly the same
        documents. The bloom summary (written beside the snapshot at
        compaction; optional — None when absent/corrupt) covers the
        SNAPSHOT rows only, never the raw dirs. Shared by the
        exact-dedup hash state and the near-dup band state — same
        layout, same crash-safety argument."""
        upto = _committed_upto(compact_root, epoch)
        snap = bloom = None
        if upto:
            snap = spark.read.parquet(f"{compact_root}/upto={upto}")
            key = (compact_root, upto)
            if key in bloom_cache:
                bloom = bloom_cache[key]
            else:
                from utc_cuip_kafka_aws_connector_spark.operators.bloom import (
                    bloom_loads,
                )

                try:
                    txt = _fs_read_text(
                        spark, f"{compact_root}/upto={upto}/_bloom.json"
                    )
                    bloom = bloom_loads(txt) if txt else None
                except Exception:
                    # checksum/IO/parse/validation failures included:
                    # the sidecar is a pure accelerator and must never
                    # be load-bearing (structural checks in
                    # bloom_loads catch valid-JSON-wrong-shape too)
                    bloom = None
                bloom_cache[key] = bloom
        raw_paths = [
            p.toString()
            for k, p in _numbered_children(state_root, "batch_id=")
            if upto <= k < epoch
        ]
        raw = spark.read.parquet(*sorted(raw_paths)) if raw_paths else None
        return snap, bloom, raw

    def _prior_state(
        state_root: str, compact_root: str, epoch: int
    ) -> DataFrame | None:
        snap, _bloom, raw = _prior_state_parts(state_root, compact_root, epoch)
        if snap is None and raw is None:
            return None
        if snap is None:
            return raw
        if raw is None:
            return snap
        return snap.unionByName(raw)

    def _compact_state(
        state_root: str,
        compact_root: str,
        upto: int,
        bloom_col: str | None = None,
    ) -> None:
        """Consolidate all batch_id < upto state into one write-once
        snapshot, then drop the now-redundant raw dirs and older
        snapshots. Write-once: a replayed epoch that already
        compacted skips straight to the (idempotent) deletes.
        ``bloom_col`` additionally writes a Bloom summary of the
        snapshot's column beside it (_bloom.json) — a pure
        accelerator the reader uses to route provably-novel rows
        around the snapshot anti-join; a crash before the sidecar
        lands just means no pre-screen until the next compaction."""
        fs, _, jvm = _fs_and_path(spark, compact_root)
        snap = f"{compact_root}/upto={int(upto)}"
        marker = jvm.org.apache.hadoop.fs.Path(f"{snap}/_SUCCESS")
        if not fs.exists(marker):
            prior = _prior_state(state_root, compact_root, int(upto))
            if prior is None:
                return
            prior.distinct().write.mode("overwrite").parquet(snap)
            if not fs.exists(marker):
                # committers configured with marksuccessfuljobs=false
                # (common on object stores) write no _SUCCESS; the
                # deletes below are only safe once the marker exists,
                # so write it ourselves — immediately after a
                # complete overwrite in THIS invocation, never over a
                # torn dir from an earlier crash (the overwrite above
                # just rewrote it in full)
                fs.create(marker, True).close()
        if bloom_col and not fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{snap}/_bloom.json")
        ):
            from utc_cuip_kafka_aws_connector_spark.operators.bloom import (
                bloom_build,
                bloom_dumps,
            )

            snap_df = spark.read.parquet(snap)
            summary = bloom_build(
                snap_df, bloom_col, max(snap_df.count(), 1), fpp=0.01
            )
            _fs_write_text(
                spark, f"{snap}/_bloom.json", bloom_dumps(summary)
            )
        for k, p in _numbered_children(state_root, "batch_id="):
            if k < upto:
                fs.delete(p, True)
        for k, p in _numbered_children(compact_root, "upto="):
            if k < upto:
                fs.delete(p, True)

    def curate_batch(batch: DataFrame, epoch_id: int) -> None:
        cols = batch.columns
        df = batch
        if c4:
            from utc_cuip_kafka_aws_connector_spark.operators.rulefilters import (
                apply_c4,
            )

            df = apply_c4(df, text_col=text_col)
        if gopher:
            from utc_cuip_kafka_aws_connector_spark.operators.rulefilters import (
                apply_gopher,
            )

            df = apply_gopher(df, text_col=text_col)
        df = (
            quality_score(df, text_col=text_col)
            .filter(F.col("quality") >= min_quality)
            .select(*cols)
        )
        if clf is not None:
            from utc_cuip_kafka_aws_connector_spark.operators.lrquality import (
                lr_filter,
            )

            df = lr_filter(
                df, clf, min_p_keep=classifier_min_p,
                id_col=id_col, text_col=text_col,
            )
        if lid is not None:
            from utc_cuip_kafka_aws_connector_spark.operators.langid import (
                langid_relabel,
            )

            df = langid_relabel(
                df, lid, id_col=id_col, text_col=text_col, lang_col=lang_col
            )
            if lang_col not in cols:
                cols = cols + [lang_col]
        # within-batch exact dedup (first id wins)
        keep = exact_dedup(df, id_col=id_col, text_col=text_col)
        df = df.join(
            keep.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
        )
        # periodic state maintenance FIRST: the state set it hands
        # the readers below is identical before/during/after, so the
        # kept-set cannot depend on whether a crash interleaved here
        if compact_every and int(epoch_id) > 0 and (
            int(epoch_id) % compact_every == 0
        ):
            _compact_state(
                seen_dir, compact_dir, int(epoch_id),
                bloom_col="content_hash",
            )
            if near_dup_threshold and near_dup_threshold > 0:
                _compact_state(bands_dir, bands_compact_dir, int(epoch_id))
        # cross-batch dedup: anti-join the hashes every PRIOR batch
        # kept — the committed snapshot + the raw dirs in
        # [snapshot, epoch); the current (possibly half-replayed)
        # epoch's own dir is excluded by the < epoch bound. The
        # snapshot's Bloom sidecar (when present) routes rows whose
        # hash PROVABLY is not in the snapshot around that join
        # scan-locally — no false negatives, so the kept-set is
        # bit-identical with or without it; the raw dirs (at most
        # compact_every small frames) are anti-joined for everyone.
        snap, snap_bloom, raw_prior = _prior_state_parts(
            seen_dir, compact_dir, int(epoch_id)
        )
        hashed = df.withColumn("content_hash", F.md5(F.col(text_col)))
        tagged = None
        if raw_prior is not None:
            hashed = hashed.join(
                raw_prior.select("content_hash"), "content_hash", "left_anti"
            )
        if snap is not None:
            if snap_bloom is not None:
                from utc_cuip_kafka_aws_connector_spark.operators.bloom import (
                    bloom_might_contain,
                )

                # persist the tagged frame: both route branches hang
                # off it, and without a shared materialization each
                # branch would recompute the upstream batch pipeline
                tagged = bloom_might_contain(
                    hashed, "content_hash", snap_bloom, out_col="__mb"
                ).persist()
                novel = tagged.filter(~F.col("__mb")).drop("__mb")
                maybe = tagged.filter(F.col("__mb")).drop("__mb").join(
                    snap.select("content_hash"), "content_hash", "left_anti"
                )
                hashed = novel.unionByName(maybe)
            else:
                hashed = hashed.join(
                    snap.select("content_hash"), "content_hash", "left_anti"
                )
        # persist ONCE, post-anti-join: the one handle every write
        # below shares, released at the end (persisting the pre-join
        # frame too would leak one batch-sized cache entry per batch)
        hashed = hashed.persist()
        verdict = None
        if near_dup_threshold and near_dup_threshold > 0:
            # cross-batch NEAR-dup suppression (r14, VERDICT r13 #6):
            # the incremental LSH matcher over a band-row state
            # maintained exactly like the hash state — epoch-keyed
            # dirs of previously KEPT docs' (band_key, doc, sig)
            # rows, batch_id < n reads, the same compaction. Exact
            # dups died above, so the matcher only pays for genuine
            # near-copies; within_batch=True makes the earlier-id
            # sibling canonical inside one micro-batch too.
            from utc_cuip_kafka_aws_connector_spark.operators.increddup import (
                build_lsh_index,
                incremental_near_dups,
            )

            prior_bands = _prior_state(
                bands_dir, bands_compact_dir, int(epoch_id)
            )
            if prior_bands is None:
                prior_bands = spark.createDataFrame(
                    [], "band_key long, doc long, sig array<bigint>"
                )
            verdict = incremental_near_dups(
                hashed,
                prior_bands,
                sim_threshold=near_dup_threshold,
                id_col=id_col,
                text_col=text_col,
            ).persist()
            # the audit trail the monitor tier exists for: every
            # suppressed doc flagged to its surviving original
            verdict.filter(F.col("is_dup")).select(
                "doc", "dup_of", "sim"
            ).write.mode("overwrite").parquet(
                f"{output_path}/_monitor/neardups/batch_id={int(epoch_id)}"
            )
            survivors = hashed.join(
                verdict.filter(~F.col("is_dup")).select(
                    F.col("doc").alias(id_col)
                ),
                id_col,
                "left_semi",
            ).persist()
            # the band write is survivors' first action: it fills the
            # survivors cache THROUGH the still-cached pre-suppression
            # frame; only then is that frame safe to drop (unpersist
            # any earlier and this write recomputes the whole batch
            # pipeline from the source)
            build_lsh_index(
                survivors, id_col=id_col, text_col=text_col
            ).write.mode("overwrite").parquet(
                f"{bands_dir}/batch_id={int(epoch_id)}"
            )
            hashed.unpersist()
            hashed = survivors
        # epoch-keyed overwrite everywhere below = idempotent replay
        hashed.select("content_hash").distinct().write.mode(
            "overwrite"
        ).parquet(f"{seen_dir}/batch_id={int(epoch_id)}")
        hashed.select(*cols).write.mode("overwrite").parquet(
            f"{data_dir}/batch_id={int(epoch_id)}"
        )
        if hot_key_col and hot_key_col in cols:
            (
                hashed.groupBy(hot_key_col)
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), F.asc(hot_key_col))
                .limit(hot_k)
                .write.mode("overwrite")
                .parquet(f"{output_path}/_monitor/hotkeys/batch_id={int(epoch_id)}")
            )
        if ref is not None:
            from utc_cuip_kafka_aws_connector_spark.operators.drift import (
                numeric_drift,
            )

            cur = hashed.withColumn("n_chars", F.length(text_col))
            cols_present = [
                c for c in drift_cols if c in cur.columns and c in ref.columns
            ]
            if cols_present:
                numeric_drift(ref, cur, list(cols_present)).write.mode(
                    "overwrite"
                ).parquet(f"{output_path}/_monitor/drift/batch_id={int(epoch_id)}")
        hashed.unpersist()
        if tagged is not None:
            tagged.unpersist()
        if verdict is not None:
            verdict.unpersist()

    src = spark.readStream.schema(schema).json(input_dir)
    query = (
        src.writeStream.foreachBatch(curate_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    query.awaitTermination()


def run_curate(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_quality: float = 0.5,
    keep_rates: str = "en=1.0",
    default_rate: float = 0.2,
) -> dict:
    """LLM-corpus curation as one command (the q99 pipeline over
    arbitrary input): quality gate -> exact dedup (keep lowest id per
    content hash) -> language-stratified mixture sampling -> parquet
    survivors. Returns {read, survived} row counts. Every stage is a
    scan-local filter or a partial-agg groupBy (see
    plans/catalog.py::q99_curation_pipeline for the plan contract)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from utc_cuip_kafka_aws_connector_spark.operators.sampling import stratified_sample
    from utc_cuip_kafka_aws_connector_spark.operators.text import quality_score

    docs = spark.read.parquet(input_path)
    n_read = docs.count()
    qual = quality_score(docs, text_col=text_col).filter(F.col("quality") >= min_quality)
    # Keep-lowest-id-per-content-hash as ONE window over md5(text) —
    # identical survivor set to the old exact_dedup aggregate +
    # LEFT SEMI join-back, but the quality-scored corpus is computed
    # once instead of twice and only one full-row exchange remains
    # (the old shape shuffled the hash/id pairs AND the corpus rows;
    # r20, guide §2.4 — the q111 chunkdedup rewrite applied to the
    # curate path). The shuffle key is the 32-hex md5 image, never
    # the text payload (the q122 hygiene rule).
    w = Window.partitionBy(F.md5(F.col(text_col)))
    surv = (
        qual.withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )
    rates = {}
    for part in keep_rates.split(","):
        k, _, v = part.partition("=")
        rates[k.strip()] = float(v)
    out = stratified_sample(surv, id_col, lang_col, rates, default_rate=default_rate)
    out.write.mode("overwrite").parquet(output_path)
    return {"read": n_read, "survived": spark.read.parquet(output_path).count()}


def run_curate_full(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    url_col: str | None = None,
    select_target: str | None = None,
    select_k: int | None = None,
    select_buckets: int = 10_000,
    select_method: str = "dsir",
    html: bool = False,
    strip_code_fences: bool = False,
    para_dedup: bool = False,
    boiler_min_docs: int = 10,
    substr_window: int = 0,
    gopher: bool = False,
    c4: bool = False,
    min_quality: float = 0.5,
    langid_model: str | None = None,
    classifier_model: str | None = None,
    classifier_min_p: float = 0.5,
    ppl_lm: str | None = None,
    ppl_max: float | None = None,
    ppl_quantile: float | None = None,
    near_dup_threshold: float | None = 0.8,
    max_per_domain: int | None = None,
    decontam_path: str | None = None,
    decontam_threshold: float = 0.5,
    decontam_embeddings: str | None = None,
    decontam_cosine: float = 0.95,
    embedding_col: str = "embedding",
    keep_rates: str = "en=1.0",
    default_rate: float = 0.2,
    split_fractions: str | None = None,
    seed: int = 0,
) -> dict:
    """curate_v4 — the WHOLE corpus build as one command (the r10/r11
    briefs' composition gap): the `clean` chain, the quality gates,
    an optional CCNet perplexity stage (``ppl_lm=`` — a Kneser-Ney
    model from ``lm --op train``), URL hygiene, exact AND near dedup,
    benchmark decontamination, the mixture sample, and a leakage-safe
    split, in the order a real build runs them, with a funnel count
    per stage. Stage order is
    the cheap-filter-first discipline: scan-local text repairs and
    quality rules shrink the corpus before any shuffle-bearing dedup
    pays its cost, and the near-dup components computed for dedup are
    REUSED as the split's leakage groups (``--split`` emits a
    ``split`` column instead of dropping rows). Each stage is the
    already-tested operator — this function only sequences them; the
    per-stage counts are one action per stage boundary, the price of
    the funnel report (at petabyte scale swap counts for
    accumulator-sampled estimates).

    Returns {"stages": [(name, rows_after), ...], "read", "survived"}.
    """
    from pyspark.sql import functions as F

    from utc_cuip_kafka_aws_connector_spark.operators.dedup import (
        dedup_clusters,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.sampling import (
        stratified_sample,
    )
    from utc_cuip_kafka_aws_connector_spark.operators.text import quality_score

    df = spark.read.parquet(input_path)
    n_read = df.count()
    stages: list[tuple[str, int]] = [("read", n_read)]
    # frames that must stay cached through the funnel (stage counts
    # replay them) and are released right after the final write
    release_after_write: list[DataFrame] = []

    def mark(name: str, frame):
        stages.append((name, frame.count()))
        return frame

    if select_target:
        # Target-domain pre-selection: shrink the raw pool BEFORE any
        # per-document cleaning pays its cost. Two interchangeable
        # criteria over the same (target parquet, raw pool) inputs:
        # DSIR's hashed-bucket importance resampling (stochastic,
        # seeded) or Moore-Lewis cross-entropy difference (two KN LMs
        # — target and the raw pool itself as the generic side, the
        # Moore & Lewis 2010 setup — deterministic top-k).
        if not select_k:
            raise ValueError("select_target needs select_k")
        if select_method not in ("dsir", "moore-lewis"):
            raise ValueError(
                f"select_method must be dsir|moore-lewis, got "
                f"{select_method!r}"
            )
        tgt = spark.read.parquet(select_target)
        if select_method == "dsir":
            from utc_cuip_kafka_aws_connector_spark.operators.dsir import (
                dsir_fit,
                dsir_resample,
                dsir_weights,
            )

            sel_model = dsir_fit(
                tgt, df, text_col=text_col, n_buckets=select_buckets
            )
            weighted = dsir_weights(
                df,
                sel_model,
                text_col=text_col,
                id_col=id_col,
                n_buckets=select_buckets,
            )
            chosen = dsir_resample(
                weighted, select_k, seed=seed, id_col=id_col
            ).select(id_col)
            df = mark("dsir_select", df.join(chosen, id_col, "left_semi"))
        else:
            from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
                kn_train,
                kn_unpersist,
                moore_lewis_score,
                select_by_ce_diff,
            )

            t_lm = kn_train(tgt, text_col=text_col, order=3)
            g_lm = kn_train(df, text_col=text_col, order=3)
            scored = moore_lewis_score(
                df.select(id_col, text_col), t_lm, g_lm,
                text_col=text_col, id_col=id_col,
            )
            # persist the k survivor ids so downstream stage counts
            # replay a cached id list, not two LM scoring passes;
            # released after the final write (ADVICE r13: leaving it
            # cached leaked one entry for the rest of the job)
            chosen = select_by_ce_diff(scored, select_k, id_col=id_col).select(
                id_col
            ).persist()
            release_after_write.append(chosen)
            df = mark(
                "moore_lewis_select", df.join(chosen, id_col, "left_semi")
            )
            kn_unpersist(t_lm)
            kn_unpersist(g_lm)
    if html:
        from utc_cuip_kafka_aws_connector_spark.operators.extract import (
            html_to_text,
        )

        df = mark("html_extract", html_to_text(df, text_col=text_col))
    if strip_code_fences:
        from utc_cuip_kafka_aws_connector_spark.operators.mdsplit import (
            split_code_fences,
        )

        _require_cols_absent(
            df, ("prose", "code_blocks", "code_ratio"), "--strip-code-fences"
        )
        df = mark(
            "strip_code_fences",
            split_code_fences(df, text_col=text_col)
            .drop(text_col, "code_blocks", "code_ratio")
            .withColumnRenamed("prose", text_col),
        )
    if para_dedup:
        from utc_cuip_kafka_aws_connector_spark.operators.intradedup import (
            dedup_paragraphs,
        )

        _require_cols_absent(df, ("paras_removed",), "--para-dedup")
        df = mark(
            "para_dedup",
            dedup_paragraphs(df, text_col=text_col).drop("paras_removed"),
        )
    from utc_cuip_kafka_aws_connector_spark.operators.boilerplate import (
        strip_boilerplate,
    )

    df = mark(
        "boilerplate",
        strip_boilerplate(
            df, id_col=id_col, text_col=text_col, min_docs=boiler_min_docs
        ),
    )
    if substr_window:
        from utc_cuip_kafka_aws_connector_spark.operators.substrdedup import (
            strip_duplicate_spans,
        )

        df = mark(
            "substr_dedup",
            strip_duplicate_spans(
                df, id_col=id_col, text_col=text_col, window=substr_window
            ),
        )
    if c4:
        from utc_cuip_kafka_aws_connector_spark.operators.rulefilters import (
            apply_c4,
        )

        df = mark("c4_rules", apply_c4(df, text_col=text_col))
    if gopher:
        from utc_cuip_kafka_aws_connector_spark.operators.rulefilters import (
            apply_gopher,
        )

        df = mark("gopher_rules", apply_gopher(df, text_col=text_col))
    df = mark(
        "quality",
        quality_score(df, text_col=text_col).filter(
            F.col("quality") >= min_quality
        ),
    )
    if classifier_model:
        # the learned keep-vs-drop filter (fastText-shaped LR,
        # operators/lrquality.py) — after the heuristic rules shrink
        # the scoring input, before any shuffle-bearing stage
        from utc_cuip_kafka_aws_connector_spark.operators.lrquality import (
            lr_filter,
            lr_load,
        )

        clf = lr_load(classifier_model)
        df = mark(
            "classifier",
            lr_filter(
                df, clf, min_p_keep=classifier_min_p,
                id_col=id_col, text_col=text_col,
            ),
        )
    if ppl_lm:
        # CCNet's model-based stage: perplexity under a reference-
        # corpus Kneser-Ney LM, AFTER the cheap rules (they shrink the
        # scoring input) and BEFORE the shuffle-bearing dedup.
        from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
            kn_score,
            load_kn_lm,
        )

        if (ppl_max is None) == (ppl_quantile is None):
            raise ValueError(
                "ppl_lm needs exactly one of ppl_max (absolute cut) or "
                "ppl_quantile (keep the best fraction)"
            )
        lm = load_kn_lm(spark, ppl_lm)
        scored = kn_score(df, lm, text_col=text_col, id_col=id_col).select(
            id_col, "ppl"
        )
        df = df.join(scored, id_col, "left")
        if ppl_quantile is not None:
            # approxQuantile returns [] on an empty frame (everything
            # died at an earlier stage) — fail with the funnel story,
            # not an IndexError (ADVICE r12)
            qs = df.approxQuantile("ppl", [float(ppl_quantile)], 0.001)
            if not qs:
                raise ValueError(
                    "perplexity stage received an empty frame (every "
                    "document was dropped by an earlier stage — see "
                    f"the funnel counts so far: {stages}); cannot "
                    "derive a ppl quantile threshold"
                )
            thr = qs[0]
        else:
            thr = float(ppl_max)
        df = mark("perplexity", df.filter(F.col("ppl") <= F.lit(thr)))
    if url_col:
        from utc_cuip_kafka_aws_connector_spark.operators.urlops import (
            normalize_url,
            per_domain_cap,
        )

        df = df.withColumn(url_col, normalize_url(url_col))
        if max_per_domain:
            df = mark(
                "domain_cap",
                per_domain_cap(
                    df,
                    url_col=url_col,
                    max_per_domain=max_per_domain,
                    order_col="quality",
                    id_col=id_col,
                ),
            )
    keep = exact_dedup(df, id_col=id_col, text_col=text_col).select(
        F.col("keep_id").alias(id_col)
    )
    df = mark("exact_dedup", df.join(keep, id_col, "left_semi"))

    components = None
    if near_dup_threshold is not None:
        pairs = minhash_lsh_pairs(
            df, id_col, text_col=text_col, jaccard_threshold=near_dup_threshold
        )
        clusters = dedup_clusters(df, pairs, id_col=id_col)
        components = clusters.select(
            F.col(id_col), F.col("component")
        )
        survivors = clusters.filter(F.col("keep")).select(id_col)
        df = mark("near_dedup", df.join(survivors, id_col, "left_semi"))
    if decontam_path:
        from utc_cuip_kafka_aws_connector_spark.operators.decontam import (
            ngram_decontaminate,
        )

        bench = spark.read.parquet(decontam_path)
        tainted = ngram_decontaminate(
            df, bench, id_col=id_col, text_col=text_col
        ).filter(F.col("contamination") >= decontam_threshold)
        df = mark(
            "decontam", df.join(tainted.select(id_col), id_col, "left_anti")
        )
    if decontam_embeddings:
        # paraphrase leakage the n-gram pass misses: needs an
        # embedding column on the corpus (upstream featurization)
        from utc_cuip_kafka_aws_connector_spark.operators.semdecontam import (
            semantic_decontaminate,
        )

        if embedding_col not in df.columns:
            raise ValueError(
                f"decontam_embeddings needs a {embedding_col!r} column on "
                "the corpus (set embedding_col= to its name)"
            )
        evals = spark.read.parquet(decontam_embeddings)
        df = mark(
            "semantic_decontam",
            semantic_decontaminate(
                df,
                evals,
                threshold=decontam_cosine,
                id_col=id_col,
                vec_col=embedding_col,
            ),
        )
    if langid_model:
        # model-based language ID (operators/langid.py, r14): the
        # char-n-gram NB identifier OVERWRITES lang_col, so the
        # mixture sample stratifies on predicted language instead of
        # trusting (possibly absent/mislabeled) metadata. Placed
        # immediately before its only consumer — scoring the raw pool
        # up front would NB-score docs the filters are about to drop
        # (review r14) — and persisted: the relabel join is replayed
        # by every later stage count and the final write.
        from utc_cuip_kafka_aws_connector_spark.operators.langid import (
            langid_load,
            langid_relabel,
        )

        lid = langid_load(spark, langid_model)
        df = langid_relabel(
            df, lid, id_col=id_col, text_col=text_col, lang_col=lang_col
        ).persist()
        release_after_write.append(df)
        stages.append(("langid", df.count()))
    rates = {}
    for part in keep_rates.split(","):
        k, _, v = part.partition("=")
        rates[k.strip()] = float(v)
    df = mark(
        "mixture",
        stratified_sample(df, id_col, lang_col, rates, default_rate=default_rate),
    )
    if split_fractions:
        from utc_cuip_kafka_aws_connector_spark.operators.split import (
            leakage_safe_split,
        )

        fr = {}
        for part in split_fractions.split(","):
            k, _, v = part.partition("=")
            fr[k.strip()] = float(v)
        comp = (
            components
            if components is not None
            else df.select(F.col(id_col), F.col(id_col).alias("component"))
        )
        df = leakage_safe_split(df, comp, fr, seed=seed, id_col=id_col)
    df.write.mode("overwrite").parquet(output_path)
    for frame in release_after_write:
        frame.unpersist()
    survived = spark.read.parquet(output_path).count()
    stages.append(("written", survived))
    return {"stages": stages, "read": n_read, "survived": survived}


class _released_operator_blocks:
    """Release every RDD block persisted inside the ``with`` body once
    it exits. Some operators persist internal frames that several of
    their own consumers share (setjoin's rarest-first ordered-set
    frame, retrieval's per-document length table) and leave the
    release to whoever runs the terminal action — a lazy return value
    cannot unpersist its own lineage without recomputing it. The CLI
    runners are those terminal callers, so they wrap the operator
    call + action in this guard: a long-running composed pipeline
    then never accumulates MEMORY_AND_DISK blocks across stages
    (guide §5 unpersist-when-done; VERDICT r20 #7). unpersist is a
    hint-removal, never a correctness risk — worst case a block is
    dropped before a re-read and recomputes."""

    def __init__(self, spark: SparkSession):
        self._jsc = spark.sparkContext._jsc

    def __enter__(self):
        self._before = set(self._jsc.getPersistentRDDs().keys())
        return self

    def __exit__(self, *exc) -> bool:
        blocks = self._jsc.getPersistentRDDs()
        for key in blocks.keys():
            if key not in self._before:
                blocks[key].unpersist()
        return False


def run_simjoin(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 3,
) -> dict:
    """EXACT near-duplicate pair detection over a parquet corpus via
    the prefix-filtered set-similarity join (operators/setjoin.py,
    q113's operator): word-``shingle``-gram sets, Jaccard >=
    ``threshold``, pairs written as parquet. shingle=1 joins on plain
    word sets. Returns {read, pairs}."""
    from utc_cuip_kafka_aws_connector_spark.operators.setjoin import (
        prefix_filter_jaccard_join,
        shingle_sets,
        tokenize_distinct,
    )

    docs = spark.read.parquet(input_path)
    n_read = docs.count()
    sets = (
        tokenize_distinct(docs, id_col=id_col, text_col=text_col)
        if shingle == 1
        else shingle_sets(docs, id_col=id_col, text_col=text_col, n=shingle)
    )
    with _released_operator_blocks(spark):
        pairs = prefix_filter_jaccard_join(sets, threshold=threshold)
        pairs.write.mode("overwrite").parquet(output_path)
    return {"read": n_read, "pairs": spark.read.parquet(output_path).count()}


def run_retrieve(
    spark: SparkSession,
    input_path: str,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list:
    """BM25 top-k retrieval (operators/retrieval.py, q114's operator)
    of a single ad-hoc query against a parquet corpus; returns the
    ranked (doc_id, score) rows."""
    from utc_cuip_kafka_aws_connector_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(input_path)
    probes = spark.createDataFrame([("q0", query)], "query_id string, query string")
    with _released_operator_blocks(spark):
        return (
            bm25_topk(docs, probes, k=k, id_col=id_col, text_col=text_col)
            .orderBy("rnk")
            .collect()
        )


def run_layout(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    curve: str = "z",
) -> dict:
    """Rewrite a parquet table clustered on a space-filling curve over
    two columns (operators/layout.py) so min/max footer stats prune
    box predicates on BOTH dimensions. Returns {rows}."""
    from utc_cuip_kafka_aws_connector_spark.operators.layout import write_clustered

    df = spark.read.parquet(input_path)
    write_clustered(df, output_path, x_col, y_col, bits=bits, curve=curve)
    return {"rows": spark.read.parquet(output_path).count()}


def run_classify(
    spark: SparkSession,
    train_path: str,
    input_path: str,
    output_path: str,
    label_col: str = "lang",
    keep_label: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "nb",
    save_model: str | None = None,
) -> dict:
    """Model-based corpus classification/filtering. ``method="nb"``
    (operators/nbquality.py): the zero-iteration generative hashed-NB
    — predict a label per doc or (with ``keep_label``) the log-odds
    filter table. ``method="lr"`` (operators/lrquality.py): the
    discriminative fastText-shaped logistic regression — REQUIRES
    ``keep_label`` (it is a binary keep-vs-drop model; training
    labels become 1 where ``label_col == keep_label``) and emits
    ``(id, p_keep)``. Returns {train, scored}."""
    if save_model and method != "lr":
        raise ValueError(
            "--save-model only applies to --method lr (the NB model "
            "is a DataFrame, re-derived in one aggregation — nothing "
            "is written, so failing loudly beats a missing directory "
            "surfacing later in curate-full)"
        )
    train = spark.read.parquet(train_path)
    docs = spark.read.parquet(input_path)
    if method == "nb":
        from utc_cuip_kafka_aws_connector_spark.operators.nbquality import (
            nb_log_odds,
            nb_predict,
            nb_train,
        )

        model = nb_train(train, text_col=text_col, label_col=label_col)
        out = (
            nb_log_odds(docs, model, keep_label, id_col=id_col, text_col=text_col)
            if keep_label
            else nb_predict(docs, model, id_col=id_col, text_col=text_col)
        )
    elif method == "lr":
        from utc_cuip_kafka_aws_connector_spark.operators.lrquality import (
            lr_score,
            lr_train,
        )

        if not keep_label:
            raise ValueError(
                "method='lr' is a binary keep-vs-drop classifier: pass "
                "--keep-label to mark the positive class"
            )
        binary = train.withColumn(
            "label",
            (F.col(label_col) == F.lit(keep_label)).cast("int"),
        )
        model = lr_train(binary, text_col=text_col, label_col="label")
        if save_model:
            from utc_cuip_kafka_aws_connector_spark.operators.lrquality import (
                lr_save,
            )

            lr_save(model, save_model)
        out = lr_score(docs, model, id_col=id_col, text_col=text_col)
    else:
        raise ValueError(f"method must be nb|lr, got {method!r}")
    out.write.mode("overwrite").parquet(output_path)
    return {
        "train": train.count(),
        "scored": spark.read.parquet(output_path).count(),
    }


def run_hotkeys(
    spark: SparkSession,
    input_path: str,
    column: str,
    k: int = 64,
    rows_per_task: int | None = None,
) -> dict:
    """Skew diagnosis (operators/heavyhitters.py): exact frequencies
    of every value above n/k in ``column``, with k-bounded shuffle
    state; optionally the salt-bucket advice for salted_join at the
    given per-task row budget. Returns {hitters, salt_buckets}."""
    from utc_cuip_kafka_aws_connector_spark.operators.heavyhitters import (
        heavy_hitters,
        suggest_salt_buckets,
    )

    df = spark.read.parquet(input_path)
    hitters = heavy_hitters(df, column, k=k).collect()
    salt = (
        suggest_salt_buckets(df, column, rows_per_task, k=k)
        if rows_per_task
        else None
    )
    return {"hitters": hitters, "salt_buckets": salt}


def run_report(
    spark: SparkSession,
    input_path: str,
    ppl_lm: str | None = None,
    dsir_target: str | None = None,
    select_buckets: int = 10_000,
    eval_embeddings: str | None = None,
    decontam_cosine: float = 0.95,
    ppl_buckets_method: str = "exact",
    diversity_ns: tuple[int, ...] | None = None,
) -> list:
    """Corpus data-card (operators/report.py) over a parquet corpus;
    returns the (metric, value) rows for display. The optional
    model-based signal blocks (r13): ``ppl_lm`` = a saved KN LM dir
    (`lm --op train`), ``dsir_target`` = a target-domain parquet (the
    DSIR model is fit here against this corpus), ``eval_embeddings``
    = an eval-suite embeddings parquet (vec_id, embedding)."""
    from utc_cuip_kafka_aws_connector_spark.operators.report import corpus_report

    df = spark.read.parquet(input_path)
    kwargs, lm = _report_signal_kwargs(
        spark, df, input_path, ppl_lm, dsir_target, select_buckets,
        eval_embeddings, decontam_cosine, ppl_buckets_method,
    )
    rows = corpus_report(df, diversity_ns=diversity_ns, **kwargs).collect()
    if lm is not None:
        from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
            kn_unpersist,
        )

        kn_unpersist(lm)
    return rows


def _report_signal_kwargs(
    spark, df, input_path, ppl_lm, dsir_target, select_buckets,
    eval_embeddings, decontam_cosine, ppl_buckets_method="exact",
):
    """Assemble corpus_report's model-signal kwargs from CLI paths —
    shared by `report` and `release-report`. The DSIR model is fit
    against ``df`` (the corpus being described; for release-report,
    the NEW version, so both sides weigh against one model).
    Returns (kwargs, loaded_lm_or_None)."""
    kwargs: dict = {}
    lm = None
    if ppl_lm:
        from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
            load_kn_lm,
        )

        lm = load_kn_lm(spark, ppl_lm)
        kwargs["ppl_lm"] = lm
        kwargs["ppl_buckets_method"] = ppl_buckets_method
    if dsir_target:
        from utc_cuip_kafka_aws_connector_spark.operators.dsir import dsir_fit

        kwargs["dsir_model"] = dsir_fit(
            spark.read.parquet(dsir_target), df, n_buckets=select_buckets
        )
        kwargs["dsir_buckets"] = select_buckets
    if eval_embeddings:
        if "embedding" not in df.columns:
            raise ValueError(
                "--eval-embeddings needs an 'embedding' column on the "
                "corpus itself (join your embeddings table onto the "
                f"documents first); {input_path} has columns "
                f"{df.columns}"
            )
        kwargs["eval_embeddings"] = spark.read.parquet(eval_embeddings)
        kwargs["decontam_cosine"] = decontam_cosine
    return kwargs, lm


def run_release_report(
    spark: SparkSession,
    old_path: str,
    new_path: str,
    ppl_lm: str | None = None,
    dsir_target: str | None = None,
    select_buckets: int = 10_000,
    eval_embeddings: str | None = None,
    decontam_cosine: float = 0.95,
    drift_cols: str = "n_chars",
    ppl_buckets_method: str = "exact",
) -> list:
    """Release notes between two corpus versions (operators/
    report.py::release_report): membership changes, every scalar
    card metric as new-minus-old deltas (model-signal blocks
    included when their inputs are passed), and numeric drift of
    ``drift_cols`` (comma-separated)."""
    from utc_cuip_kafka_aws_connector_spark.operators.report import (
        release_report,
    )

    old = spark.read.parquet(old_path)
    new = spark.read.parquet(new_path)
    if eval_embeddings and "embedding" not in old.columns:
        # corpus_report runs on BOTH sides — the friendly error must
        # cover the old version too, not surface as a mid-job
        # AnalysisException citing the wrong path
        raise ValueError(
            "--eval-embeddings needs an 'embedding' column on BOTH "
            f"corpus versions; {old_path} has columns {old.columns}"
        )
    kwargs, lm = _report_signal_kwargs(
        spark, new, new_path, ppl_lm, dsir_target, select_buckets,
        eval_embeddings, decontam_cosine, ppl_buckets_method,
    )
    cols = tuple(c.strip() for c in drift_cols.split(",") if c.strip())
    missing = [
        c for c in cols if c not in old.columns or c not in new.columns
    ]
    if missing:
        import sys as _sys

        # loud, not fatal: the operator contract skips absent columns,
        # but a typo'd --drift-cols must not read as "no drift"
        print(
            f"release-report: WARNING — drift column(s) {missing} absent "
            "from one or both versions; no drift rows computed for them",
            file=_sys.stderr,
        )
    rows = release_report(old, new, drift_cols=cols, **kwargs).collect()
    if lm is not None:
        from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
            kn_unpersist,
        )

        kn_unpersist(lm)
    return rows


def run_normalize(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    lower: bool = False,
    strip_accents: bool = False,
    form: str = "NFKC",
) -> dict:
    """Unicode-normalize a corpus's text column (operators/
    normalize.py) and write the cleaned parquet. Returns {rows}."""
    from utc_cuip_kafka_aws_connector_spark.operators.normalize import (
        normalize_text,
    )

    df = spark.read.parquet(input_path)
    normalize_text(df, form=form, lower=lower, strip_accents=strip_accents).write.mode(
        "overwrite"
    ).parquet(output_path)
    return {"rows": spark.read.parquet(output_path).count()}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="utc_cuip_kafka_aws_connector_spark")
    parser.add_argument(
        "--committer",
        default="default",
        choices=["default", "s3a-magic"],
        help=(
            "output-commit protocol: 's3a-magic' applies the S3A magic-"
            "committer session conf (atomic multipart commit for s3a:// "
            "outputs; needs hadoop-aws + spark-hadoop-cloud jars on the "
            "cluster). 'default' = the built-in FileOutputCommitter, fine "
            "for HDFS/local paths."
        ),
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    ingest = sub.add_parser("ingest", help="batch-ingest JSON lines into the partitioned lake")
    ingest.add_argument("--topic", required=True, help="Kafka topic name the file came from")
    ingest.add_argument("--input", required=True, help="JSON-lines input path")
    ingest.add_argument("--output", required=True, help="lake root (local or s3a://)")
    ingest.add_argument("--backup-output", default=None, help="optional second lake root")
    ingest.add_argument("--format", default="parquet", choices=["parquet", "csv"])

    cfg = sub.add_parser(
        "ingest-config", help="ingest every topic from a reference-shaped config in one run"
    )
    cfg.add_argument("--config", required=True, help="config.yaml/json (kafka[0].topics)")
    cfg.add_argument("--input-root", required=True, help="directory of <topic>.jsonl files")
    cfg.add_argument("--output", required=True)
    cfg.add_argument("--backup-output", default=None)
    cfg.add_argument("--format", default="parquet", choices=["parquet", "csv"])

    stream = sub.add_parser("stream", help="streaming ingest with idempotent sink (availableNow)")
    stream.add_argument("--topic", required=True)
    stream.add_argument("--input", required=True, help="directory the streaming source watches")
    stream.add_argument("--output", required=True)
    stream.add_argument("--checkpoint", required=True)
    stream.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    stream.add_argument(
        "--sink",
        default="epoch-dirs",
        choices=["epoch-dirs", "txlog"],
        help="exactly-once strategy: epoch-keyed overwrite dirs (partitioned "
        "layout preserved) or the transaction-log table (atomic manifest "
        "commits, snapshot reads, time travel)",
    )

    scurate = sub.add_parser(
        "stream-curate",
        help="streaming curation consumer (availableNow): rule filters + "
        "exact dedup within AND across batches + hot-key/drift monitors "
        "in one foreachBatch, exactly-once under replay",
    )
    scurate.add_argument("--input", required=True, help="jsonl directory the source watches")
    scurate.add_argument("--output", required=True)
    scurate.add_argument("--checkpoint", required=True)
    scurate.add_argument(
        "--schema", default="doc_id long, text string, lang string"
    )
    scurate.add_argument("--id-col", default="doc_id")
    scurate.add_argument("--text-col", default="text")
    scurate.add_argument("--min-quality", type=float, default=0.5)
    scurate.add_argument("--c4", action="store_true")
    scurate.add_argument("--gopher", action="store_true")
    scurate.add_argument("--hot-key-col", default=None)
    scurate.add_argument("--hot-k", type=int, default=20)
    scurate.add_argument(
        "--drift-ref", default=None,
        help="reference parquet for per-batch numeric drift monitoring",
    )
    scurate.add_argument(
        "--classifier-model", default=None,
        help="saved lrquality PipelineModel dir: adds the learned "
        "keep-vs-drop stage per micro-batch",
    )
    scurate.add_argument("--classifier-min-p", type=float, default=0.5)
    scurate.add_argument(
        "--compact-every", type=int, default=16,
        help="consolidate the cross-batch hash state into one snapshot "
        "every N epochs and drop the per-batch dirs (0 disables); "
        "bounds listing+scan cost at CRON-daemon timescales",
    )
    scurate.add_argument(
        "--langid-model", default=None,
        help="saved char-n-gram NB language identifier dir (`langid "
        "--op train`): relabels --lang-col with predicted languages "
        "per micro-batch (batch/stream parity with curate-full)",
    )
    scurate.add_argument("--lang-col", default="lang")
    scurate.add_argument(
        "--near-dup-threshold", type=float, default=0.0,
        help="estimated-Jaccard threshold for cross-batch NEAR-dup "
        "suppression via the incremental LSH matcher (0 disables); "
        "suppressed docs are flagged to their originals under "
        "_monitor/neardups/",
    )

    curate = sub.add_parser(
        "curate", help="LLM-corpus curation: quality gate -> dedup -> mixture sample"
    )
    curate.add_argument("--input", required=True, help="documents parquet path")
    curate.add_argument("--output", required=True, help="survivors parquet path")
    curate.add_argument("--id-col", default="doc_id")
    curate.add_argument("--text-col", default="text")
    curate.add_argument("--lang-col", default="lang")
    curate.add_argument("--min-quality", type=float, default=0.5)
    curate.add_argument(
        "--keep-rates",
        default="en=1.0",
        help="per-language keep rates, e.g. 'en=1.0,de=0.5'",
    )
    curate.add_argument("--default-rate", type=float, default=0.2)

    curate_full = sub.add_parser(
        "curate-full",
        help="curate_v4: the whole corpus build in one command — clean "
        "chain, quality gates, URL hygiene, exact+near dedup, "
        "decontamination, mixture sample, leakage-safe split — with a "
        "per-stage funnel report",
    )
    curate_full.add_argument("--input", required=True)
    curate_full.add_argument("--output", required=True)
    curate_full.add_argument("--id-col", default="doc_id")
    curate_full.add_argument("--text-col", default="text")
    curate_full.add_argument("--lang-col", default="lang")
    curate_full.add_argument("--url-col", default=None)
    curate_full.add_argument("--html", action="store_true")
    curate_full.add_argument(
        "--strip-code-fences", action="store_true",
        help="feed only the prose stream forward (see clean)",
    )
    curate_full.add_argument(
        "--para-dedup", action="store_true",
        help="drop within-document repeated paragraphs (see clean)",
    )
    curate_full.add_argument(
        "--select-target", default=None,
        help="target-domain sample parquet: adds a pre-selection "
        "stage shrinking the raw pool toward the target "
        "(--select-method picks the criterion)",
    )
    curate_full.add_argument("--select-k", type=int, default=None)
    curate_full.add_argument("--select-buckets", type=int, default=10_000)
    curate_full.add_argument(
        "--select-method", choices=("dsir", "moore-lewis"),
        default="dsir",
        help="dsir = hashed-bucket importance resampling (seeded); "
        "moore-lewis = Kneser-Ney cross-entropy difference, "
        "deterministic top-k",
    )
    curate_full.add_argument("--boiler-min-docs", type=int, default=10)
    curate_full.add_argument(
        "--substr-window", type=int, default=0, help="0 = skip substring dedup"
    )
    curate_full.add_argument("--gopher", action="store_true")
    curate_full.add_argument("--c4", action="store_true")
    curate_full.add_argument("--min-quality", type=float, default=0.5)
    curate_full.add_argument(
        "--langid-model", default=None,
        help="saved char-n-gram NB language identifier dir (`langid "
        "--op train`): OVERWRITES lang-col with predicted languages "
        "before the mixture sample",
    )
    curate_full.add_argument(
        "--classifier-model", default=None,
        help="saved lrquality PipelineModel dir (classify --method lr "
        "training, lr_save): adds the learned keep-vs-drop stage",
    )
    curate_full.add_argument("--classifier-min-p", type=float, default=0.5)
    curate_full.add_argument(
        "--ppl-lm", default=None,
        help="Kneser-Ney LM dir (see `lm --op train`): adds the CCNet "
        "perplexity stage; pair with --ppl-max or --ppl-quantile",
    )
    curate_full.add_argument(
        "--ppl-max", type=float, default=None,
        help="perplexity stage: absolute keep threshold",
    )
    curate_full.add_argument(
        "--ppl-quantile", type=float, default=None,
        help="perplexity stage: keep the best fraction, e.g. 0.9",
    )
    curate_full.add_argument(
        "--near-dup-threshold", type=float, default=0.8,
        help="MinHash-LSH Jaccard threshold; negative to skip near dedup",
    )
    curate_full.add_argument("--max-per-domain", type=int, default=None)
    curate_full.add_argument(
        "--decontam", default=None, help="benchmark parquet to decontaminate against"
    )
    curate_full.add_argument("--decontam-threshold", type=float, default=0.5)
    curate_full.add_argument(
        "--decontam-embeddings", default=None,
        help="eval embeddings parquet (vec_id, embedding): adds the "
        "semantic decontamination stage; corpus needs --embedding-col",
    )
    curate_full.add_argument("--decontam-cosine", type=float, default=0.95)
    curate_full.add_argument("--embedding-col", default="embedding")
    curate_full.add_argument("--keep-rates", default="en=1.0")
    curate_full.add_argument("--default-rate", type=float, default=0.2)
    curate_full.add_argument(
        "--split", default=None,
        help="emit a leakage-safe split column, e.g. 'train=0.9,val=0.05,test=0.05'",
    )
    curate_full.add_argument("--seed", type=int, default=0)

    simjoin = sub.add_parser(
        "simjoin",
        help="exact near-duplicate pairs via prefix-filtered set-similarity join",
    )
    simjoin.add_argument("--input", required=True, help="documents parquet path")
    simjoin.add_argument("--output", required=True, help="pairs parquet path")
    simjoin.add_argument("--threshold", type=float, default=0.8, help="Jaccard threshold")
    simjoin.add_argument("--id-col", default="doc_id")
    simjoin.add_argument("--text-col", default="text")
    simjoin.add_argument(
        "--shingle", type=int, default=3, help="word n-gram size (1 = plain word sets)"
    )

    retrieve = sub.add_parser(
        "retrieve", help="BM25 top-k retrieval of an ad-hoc query over a corpus"
    )
    retrieve.add_argument("--input", required=True, help="documents parquet path")
    retrieve.add_argument("--query", required=True, help="query text")
    retrieve.add_argument("--k", type=int, default=10)
    retrieve.add_argument("--id-col", default="doc_id")
    retrieve.add_argument("--text-col", default="text")

    layout = sub.add_parser(
        "layout",
        help="rewrite parquet clustered on a 2-D space-filling curve "
        "(min/max skipping on both dimensions)",
    )
    layout.add_argument("--input", required=True)
    layout.add_argument("--output", required=True)
    layout.add_argument("--x-col", required=True)
    layout.add_argument("--y-col", required=True)
    layout.add_argument("--bits", type=int, default=8)
    layout.add_argument("--curve", choices=["z", "hilbert"], default="z")

    perturb = sub.add_parser(
        "perturb",
        help="deterministic typo noise (swap/drop/double per word): "
        "robustness augmentation and planted near-dup eval sets",
    )
    perturb.add_argument("--input", required=True, help="documents parquet")
    perturb.add_argument("--output", required=True)
    perturb.add_argument("--id-col", default="doc_id")
    perturb.add_argument("--text-col", default="text")
    perturb.add_argument("--rate", type=float, default=0.1,
                         help="expected fraction of words edited")
    perturb.add_argument("--seed", type=int, default=0)

    order = sub.add_parser(
        "order",
        help="in-context pretraining order: cluster by embedding and "
        "chain each cluster by greedy nearest neighbor — sort by "
        "(cluster_id, pack_order) before packing",
    )
    order.add_argument("--input", required=True, help="embeddings parquet")
    order.add_argument("--output", required=True, help="(id, cluster_id, pack_order) parquet")
    order.add_argument("--id-col", default="vec_id")
    order.add_argument("--vec-col", default="embedding")
    order.add_argument("--n-clusters", type=int, default=16)
    order.add_argument("--max-cluster-size", type=int, default=100_000)
    order.add_argument("--seed", type=int, default=0)

    report = sub.add_parser(
        "report", help="print the corpus data-card (rows, lengths, quality, "
        "entropy, dup ratio, slice distributions; optional LM-perplexity, "
        "DSIR target-likeness, and eval-contamination signal blocks)"
    )
    report.add_argument("--input", required=True, help="documents parquet path")
    report.add_argument(
        "--ppl-lm", default=None,
        help="saved KN LM dir: adds ppl_mean + CCNet bucket-cut rows",
    )
    report.add_argument(
        "--dsir-target", default=None,
        help="target-domain parquet: adds the dsir_logweight_mean row",
    )
    report.add_argument("--select-buckets", type=int, default=10_000)
    report.add_argument(
        "--ppl-buckets-method", choices=("exact", "approx"),
        default="exact",
        help="ppl bucket-cut rows: 'exact' (deterministic; the form "
        "published card numbers should rest on) or 'approx' "
        "(approxQuantile, no global sort — the corpus-scale choice)",
    )
    report.add_argument(
        "--eval-embeddings", default=None,
        help="eval embeddings parquet (vec_id, embedding): adds the "
        "semantic-contamination rows",
    )
    report.add_argument("--decontam-cosine", type=float, default=0.95)
    report.add_argument(
        "--diversity-ns", default=None,
        help="comma-separated n values (e.g. 1,2,3): adds distinct-n "
        "diversity rows (approx HLL counting; its own corpus pass)",
    )

    relrep = sub.add_parser(
        "release-report",
        help="release notes between two corpus versions: membership "
        "changes, per-metric deltas (model-signal blocks included), "
        "numeric drift",
    )
    relrep.add_argument("--old", required=True, help="previous-version parquet")
    relrep.add_argument("--new", required=True, help="new-version parquet")
    relrep.add_argument("--ppl-lm", default=None)
    relrep.add_argument("--dsir-target", default=None)
    relrep.add_argument("--select-buckets", type=int, default=10_000)
    relrep.add_argument(
        "--ppl-buckets-method", choices=("exact", "approx"),
        default="exact",
    )
    relrep.add_argument("--eval-embeddings", default=None)
    relrep.add_argument("--decontam-cosine", type=float, default=0.95)
    relrep.add_argument(
        "--drift-cols", default="n_chars",
        help="comma-separated numeric columns for PSI drift",
    )

    norm = sub.add_parser(
        "normalize", help="unicode-normalize the text column (NFKC + control "
        "strip + whitespace collapse; optional lower/accent strip)"
    )
    norm.add_argument("--input", required=True)
    norm.add_argument("--output", required=True)
    norm.add_argument("--form", default="NFKC", choices=["NFC", "NFKC", "NFD", "NFKD"])
    norm.add_argument("--lower", action="store_true")
    norm.add_argument("--strip-accents", action="store_true")

    classify = sub.add_parser(
        "classify",
        help="train the hashed-NB classifier on labeled docs, then "
        "predict labels (or emit a --keep-label log-odds filter table)",
    )
    classify.add_argument("--train", required=True, help="labeled training parquet")
    classify.add_argument("--input", required=True, help="corpus parquet to score")
    classify.add_argument("--output", required=True, help="predictions/odds parquet")
    classify.add_argument("--label-col", default="lang")
    classify.add_argument(
        "--keep-label",
        default=None,
        help="emit (id, log_odds) vs this label instead of predictions "
        "(required for --method lr, where it marks the positive class)",
    )
    classify.add_argument(
        "--method", choices=("nb", "lr"), default="nb",
        help="nb = generative hashed Naive Bayes (one aggregation); "
        "lr = discriminative fastText-shaped logistic regression "
        "(MLlib L-BFGS, calibrated p_keep)",
    )
    classify.add_argument(
        "--save-model", default=None,
        help="lr only: persist the fitted PipelineModel here (feeds "
        "curate-full --classifier-model)",
    )
    classify.add_argument("--id-col", default="doc_id")
    classify.add_argument("--text-col", default="text")

    langid = sub.add_parser(
        "langid",
        help="char-n-gram NB language identification: train on a "
        "labeled corpus / predict per-document languages (feeds "
        "curate-full --langid-model)",
    )
    langid.add_argument(
        "--op", choices=("train", "predict"), required=True
    )
    langid.add_argument("--input", required=True, help="parquet path")
    langid.add_argument(
        "--model", required=True,
        help="model dir: written by --op train, read by --op predict",
    )
    langid.add_argument(
        "--output", default=None,
        help="predict only: (id, predicted, score) parquet",
    )
    langid.add_argument("--label-col", default="lang")
    langid.add_argument("--id-col", default="doc_id")
    langid.add_argument("--text-col", default="text")
    langid.add_argument("--char-n", type=int, default=3)
    langid.add_argument("--n-features", type=int, default=1 << 18)
    langid.add_argument("--alpha", type=float, default=1.0)

    hotkeys = sub.add_parser(
        "hotkeys",
        help="exact heavy hitters of a column (Misra-Gries bounded "
        "state) + optional salt-bucket advice for skewed joins",
    )
    hotkeys.add_argument("--input", required=True, help="parquet path")
    hotkeys.add_argument("--column", required=True)
    hotkeys.add_argument("--k", type=int, default=64, help="report values above n/k")
    hotkeys.add_argument(
        "--rows-per-task",
        type=int,
        default=None,
        help="also print suggested salt buckets for this per-task row budget",
    )

    clean = sub.add_parser(
        "clean",
        help="crawl cleaning chain: HTML-to-text extraction, line-level "
        "boilerplate strip, exact repeated-substring dedup",
    )
    clean.add_argument("--input", required=True, help="parquet with (id, text)")
    clean.add_argument("--output", required=True)
    clean.add_argument("--id-col", default="doc_id")
    clean.add_argument("--text-col", default="text")
    clean.add_argument("--html", action="store_true", help="input is HTML markup")
    clean.add_argument(
        "--boiler-min-docs", type=int, default=10,
        help="strip lines occurring in at least this many distinct docs",
    )
    clean.add_argument(
        "--strip-code-fences", action="store_true",
        help="replace text with its prose stream (fenced code blocks "
        "removed) before the other stages — code wrecks lang-id/"
        "quality/ppl signals; route blocks separately via "
        "operators.mdsplit",
    )
    clean.add_argument(
        "--para-dedup", action="store_true",
        help="drop repeated paragraphs within each document "
        "(normalized first-occurrence-wins) before the other stages",
    )
    clean.add_argument(
        "--substr-window", type=int, default=50,
        help="remove repeated token spans of at least this length (0 = skip)",
    )
    clean.add_argument(
        "--gopher", action="store_true",
        help="apply the Gopher quality rules (Rae 2021 defaults) after cleaning",
    )
    clean.add_argument(
        "--c4", action="store_true",
        help="apply the C4 document rules (Raffel 2020) after cleaning",
    )
    clean.add_argument(
        "--url-col", default=None,
        help="URL column: normalize it and enable --max-per-domain",
    )
    clean.add_argument(
        "--max-per-domain", type=int, default=None,
        help="cap documents per registered domain (requires --url-col)",
    )

    ann = sub.add_parser(
        "ann",
        help="approximate-nearest-neighbor index over an embedding "
        "column: build a PCA->IVF->PQ index to disk, then search it",
    )
    ann.add_argument("--op", required=True, choices=["build", "search", "vacuum"])
    ann.add_argument("--path", required=True, help="index directory")
    ann.add_argument("--input", default=None, help="build: parquet with (id, embedding)")
    ann.add_argument(
        "--dest", default=None,
        help="vacuum: output index directory (write-aside, swap after — "
        "never rewrites the live index in place)",
    )
    ann.add_argument(
        "--delete-ids", default=None,
        help="vacuum: parquet whose first column holds ids to drop "
        "(omit for compaction only)",
    )
    ann.add_argument("--id-col", default="vec_id")
    ann.add_argument("--vec-col", default="embedding")
    ann.add_argument("--pca", type=int, default=None, help="build: reduce to this many dims first")
    ann.add_argument("--cells", type=int, default=16, help="build: IVF coarse cells")
    ann.add_argument("--m", type=int, default=8, help="build: PQ subspaces")
    ann.add_argument("--nbits", type=int, default=6, help="build: bits per PQ code")
    ann.add_argument("--query", default=None, help="search: comma-separated floats")
    ann.add_argument("--k", type=int, default=10)
    ann.add_argument("--nprobe", type=int, default=4)

    mine = sub.add_parser(
        "mine",
        help="training-pair mining over embedding tables: hard "
        "negatives for contrastive training (DPR/ANCE recipe), "
        "margin-based bitext pairs (WikiMatrix/CCMatrix recipe)",
    )
    mine.add_argument(
        "--op", required=True,
        choices=["negatives", "bitext", "positives", "corrupt", "fim"],
    )
    mine.add_argument(
        "--input", required=True,
        help="corpus parquet (negatives) / source-side parquet (bitext)",
    )
    mine.add_argument("--target", default=None, help="bitext: target-side parquet")
    mine.add_argument(
        "--anchors", default=None,
        help="negatives: anchor-subset parquet (default: the whole corpus)",
    )
    mine.add_argument("--output", required=True, help="mined-pairs parquet path")
    mine.add_argument(
        "--id-col", default=None,
        help="defaults per op: vec_id for the embedding ops "
        "(negatives/bitext), doc_id for the text ops "
        "(positives/corrupt/fim)",
    )
    mine.add_argument("--vec-col", default="embedding")
    mine.add_argument(
        "--label-col", default=None,
        help="negatives: candidates sharing the anchor's label are "
        "positives and excluded",
    )
    mine.add_argument("--k", type=int, default=5, help="negatives per anchor / kNN depth for the margin")
    mine.add_argument("--threshold", type=float, default=1.0, help="bitext: ratio-margin cut")
    mine.add_argument(
        "--strategy", default="forward", choices=["all", "forward", "mutual"],
        help="bitext: all candidates, per-source best, or bidirectional best",
    )
    mine.add_argument("--method", default="ivf", choices=["ivf", "brute"])
    mine.add_argument("--cells", type=int, default=16, help="ivf: coarse cells")
    mine.add_argument("--nprobe", type=int, default=2, help="ivf: probed cells per anchor")
    mine.add_argument(
        "--centroid-source", default="hash_spread",
        choices=["hash_spread", "kmeans"],
    )
    mine.add_argument(
        "--pair-op", default="crop", choices=["crop", "ict"],
        help="positives: independent cropping (Contriever) or "
        "inverse cloze (span vs remainder)",
    )
    mine.add_argument("--text-col", default="text", help="positives: text column")
    mine.add_argument("--min-tokens", type=int, default=4)
    mine.add_argument("--max-tokens", type=int, default=64)
    mine.add_argument("--seed", type=int, default=0)
    mine.add_argument(
        "--rate", type=float, default=0.15,
        help="corrupt: target corruption rate",
    )
    mine.add_argument(
        "--mean-span", type=int, default=3,
        help="corrupt: mean masked-span length",
    )
    mine.add_argument(
        "--rate-fim", type=float, default=0.5,
        help="fim: fraction of documents FIM-reordered",
    )
    mine.add_argument(
        "--spm-rate", type=float, default=0.5,
        help="fim: SPM share among transformed documents",
    )

    pairs = sub.add_parser(
        "pairs",
        help="preference-pair construction for RLHF/DPO training: "
        "(prompt, chosen, rejected, margin) pairs from scored "
        "candidate responses",
    )
    pairs.add_argument("--input", required=True, help="scored-responses parquet")
    pairs.add_argument("--output", required=True, help="pairs parquet path")
    pairs.add_argument("--prompt-col", default="prompt_id")
    pairs.add_argument("--id-col", default="response_id")
    pairs.add_argument("--score-col", default="score")
    pairs.add_argument(
        "--text-col", default=None,
        help="carry both texts and drop identical-text pairs",
    )
    pairs.add_argument(
        "--strategy", default="best_worst",
        choices=["best_worst", "best_rest", "all_pairs"],
    )
    pairs.add_argument("--min-margin", type=float, default=0.0)
    pairs.add_argument("--max-per-prompt", type=int, default=None)
    pairs.add_argument(
        "--stats-output", default=None,
        help="also write per-prompt diagnostics (top-tie flag, spread)",
    )

    bestof = sub.add_parser(
        "bestof",
        help="rejection sampling / best-of-n selection: keep each "
        "prompt's top-n responses by score, optionally thresholded "
        "(the SFT-side complement of `pairs`)",
    )
    bestof.add_argument("--input", required=True, help="scored-responses parquet")
    bestof.add_argument("--output", required=True, help="winners parquet path")
    bestof.add_argument("--prompt-col", default="prompt_id")
    bestof.add_argument("--id-col", default="response_id")
    bestof.add_argument("--score-col", default="score")
    bestof.add_argument("--text-col", default=None, help="carry the text")
    bestof.add_argument("--n", type=int, default=1)
    bestof.add_argument(
        "--min-score", type=float, default=None,
        help="acceptance threshold: prompts with no response above it "
        "emit nothing",
    )

    chat = sub.add_parser(
        "chat",
        help="conversation (SFT) dataset ops over "
        "array<struct<role,content>> turn columns: validate / render "
        "/ stats / dedup / truncate",
    )
    chat.add_argument(
        "--op", required=True,
        choices=["validate", "render", "stats", "dedup", "truncate"],
    )
    chat.add_argument("--input", required=True, help="conversations parquet")
    chat.add_argument("--output", required=True, help="output parquet path")
    chat.add_argument("--turns-col", default="turns")
    chat.add_argument("--id-col", default="conv_id", help="dedup: winner key")
    chat.add_argument(
        "--template", default="chatml", choices=["chatml", "plain"],
        help="render: flat-text template",
    )
    chat.add_argument(
        "--max-tokens", type=int, default=None,
        help="truncate: whitespace-token budget (whole-turn prefix)",
    )
    chat.add_argument(
        "--valid-only", action="store_true",
        help="validate: write only cv_valid rows (flags still attached)",
    )

    sample = sub.add_parser(
        "sample",
        help="weighted sampling WITHOUT replacement (Efraimidis-"
        "Spirakis, deterministic content-hash keys): exactly n rows "
        "by weight, globally or per stratum",
    )
    sample.add_argument("--input", required=True, help="input parquet")
    sample.add_argument("--output", required=True, help="sample parquet path")
    sample.add_argument("--n", type=int, default=None,
                        help="rows per draw (per stratum if --strata-col)")
    sample.add_argument(
        "--targets", default=None,
        help="per-stratum targets parquet (group + target columns — "
        "the mix verb's output with alloc aliased); alternative to --n",
    )
    sample.add_argument("--target-col", default="target")
    sample.add_argument("--id-col", default="doc_id")
    sample.add_argument("--weight-col", required=True)
    sample.add_argument("--strata-col", default=None)
    sample.add_argument("--seed", type=int, default=0)
    sample.add_argument(
        "--key-col", default=None,
        help="expose the ln(u)/w ordering key under this column",
    )

    mix = sub.add_parser(
        "mix",
        help="training-mixture planning: UniMax epoch-capped budget "
        "allocation or temperature-based mixture weights over group "
        "sizes",
    )
    mix.add_argument(
        "--op", required=True, choices=["unimax", "temperature", "doremi"]
    )
    mix.add_argument("--input", required=True, help="corpus parquet")
    mix.add_argument("--output", required=True, help="weights parquet path")
    mix.add_argument("--group-col", default="lang")
    mix.add_argument("--size-col", default="n_tokens")
    mix.add_argument("--budget", type=float, default=None,
                     help="unimax: required total budget; temperature: "
                     "optional target counts")
    mix.add_argument("--max-epochs", type=float, default=1.0,
                     help="unimax: per-group epoch cap")
    mix.add_argument("--tau", type=float, default=0.5,
                     help="temperature: w = n^tau / sum n^tau")
    mix.add_argument(
        "--pre-aggregated", action="store_true",
        help="input is already one (group, size) row per group; "
        "doremi: input is already one (step?, group, excess_loss) row",
    )
    mix.add_argument("--proxy-loss-col", default="proxy_loss",
                     help="doremi: per-example proxy-model loss")
    mix.add_argument("--ref-loss-col", default="ref_loss",
                     help="doremi: per-example reference-model loss")
    mix.add_argument("--step-col", default=None,
                     help="doremi: replay EG updates in this step order "
                     "(omit to iterate one aggregate lambda vector)")
    mix.add_argument("--lr", type=float, default=1.0,
                     help="doremi: exponentiated-gradient step size")
    mix.add_argument("--smoothing", type=float, default=1e-3,
                     help="doremi: uniform-mix floor c")
    mix.add_argument("--iters", type=int, default=1,
                     help="doremi without --step-col: EG repetitions")

    epochs_p = sub.add_parser(
        "epochs",
        help="materialize a mixture allocation as a repeated corpus: "
        "each group's rows replicated per its (possibly fractional) "
        "epochs — the `mix` output's row-level consumer",
    )
    epochs_p.add_argument("--input", required=True, help="corpus parquet")
    epochs_p.add_argument(
        "--alloc", required=True,
        help="allocation parquet (one row per group; e.g. mix --op "
        "unimax output's epochs column)",
    )
    epochs_p.add_argument("--output", required=True)
    epochs_p.add_argument("--group-col", default="lang")
    epochs_p.add_argument("--epochs-col", default="epochs")
    epochs_p.add_argument("--id-col", default="doc_id")
    epochs_p.add_argument(
        "--salt", default="epochs",
        help="fractional-draw salt (change to re-draw the fractional "
        "tier; keep fixed for nested ablations)",
    )
    epochs_p.add_argument(
        "--budget", type=float, default=None,
        help="treat --alloc as a WEIGHTS table (mix --op doremi / "
        "temperature output) and convert first: epochs = weight * "
        "budget / group size, sizes aggregated from the corpus",
    )
    epochs_p.add_argument("--weight-col", default="weight",
                          help="with --budget: the weights column")
    epochs_p.add_argument(
        "--size-col", default=None,
        help="with --budget: corpus column summed per group for "
        "sizes (default: row count)",
    )
    epochs_p.add_argument(
        "--max-epochs", type=float, default=None,
        help="with --budget: cap per-group epochs (surplus unused)",
    )

    ts = sub.add_parser(
        "trainset",
        help="materialize a training set end-to-end: allocation -> "
        "replica rows (unique example ids, optional deterministic "
        "shuffle) -> packed context windows or length-bucketed padded "
        "batches -> manifest-verified shards",
    )
    ts.add_argument("--input", required=True,
                    help="corpus parquet with token id arrays")
    ts.add_argument("--alloc", required=True,
                    help="allocation parquet (one row per group: epochs)")
    ts.add_argument("--output", required=True, help="shard directory")
    ts.add_argument("--mode", default="packed",
                    choices=["packed", "padded"])
    ts.add_argument("--group-col", default="lang")
    ts.add_argument("--epochs-col", default="epochs")
    ts.add_argument("--id-col", default="doc_id")
    ts.add_argument("--ids-col", default="token_ids")
    ts.add_argument("--salt", default="epochs",
                    help="fractional-draw salt (see the epochs verb)")
    ts.add_argument(
        "--shuffle-seed", type=int, default=None,
        help="deterministic permutation of the fill order (replicas "
        "scatter instead of packing back-to-back); omit for id order",
    )
    ts.add_argument("--context-len", type=int, default=None,
                    help="packed: window length (required)")
    ts.add_argument("--pad-id", type=int, default=0, help="packed")
    ts.add_argument("--eos-id", type=int, default=None,
                    help="packed: separator appended per document")
    ts.add_argument("--hex-chars", type=int, default=1,
                    help="packed: shard hex digits (16^n shards)")
    ts.add_argument("--batch-size", type=int, default=32, help="padded")
    ts.add_argument("--boundaries", default=None,
                    help="padded: comma-separated ascending length bounds "
                    "(default floor-log2 buckets)")
    ts.add_argument("--shard-hex", type=int, default=1, help="padded")
    ts.add_argument("--order", default="length",
                    choices=["length", "hash"], help="padded")
    ts.add_argument(
        "--no-validate-ids", action="store_true",
        help="skip the duplicate-(group,id) corpus check (one "
        "count-shaped aggregate); only when uniqueness is already "
        "enforced upstream — duplicates would collide example ids "
        "and make shard assignment layout-dependent",
    )
    ts.add_argument(
        "--budget", type=float, default=None,
        help="treat --alloc as a WEIGHTS table (mix output) and "
        "convert first: epochs = weight * budget / group token "
        "count — the epochs verb's conversion, sized here by "
        "sum(size(--ids-col)) per group",
    )
    ts.add_argument("--weight-col", default="weight",
                    help="with --budget: the weights column")
    ts.add_argument(
        "--max-epochs", type=float, default=None,
        help="with --budget: cap per-group epochs (surplus unused)",
    )

    curve = sub.add_parser(
        "curve",
        help="retention curve: docs/weight surviving each threshold "
        "on an equally spaced grid — for choosing filter cuts",
    )
    curve.add_argument("--input", required=True, help="scored parquet")
    curve.add_argument("--output", required=True, help="curve parquet path")
    curve.add_argument("--score-col", required=True)
    curve.add_argument("--lo", type=float, required=True)
    curve.add_argument("--hi", type=float, required=True)
    curve.add_argument("--points", type=int, default=50)
    curve.add_argument("--weight-col", default=None,
                       help="also track surviving weight (token mass)")
    curve.add_argument("--group-col", default=None)
    curve.add_argument(
        "--normalize", default=None, choices=["zscore", "minmax", "rank"],
        help="normalize the score WITHIN each --group-col group first "
        "(cross-source scale alignment) and curve the normalized "
        "score instead; requires --group-col",
    )
    curve.add_argument(
        "--max-groups", type=int, default=10_000,
        help="refuse if --group-col exceeds this many groups (guards "
        "against curving on a doc-id-like key); raise deliberately "
        "for a legitimately wide corpus",
    )

    tok = sub.add_parser(
        "tokenizer",
        help="BPE tokenizer lifecycle: train a merge table to "
        "tokenizer.json (plain or byte-level), encode a corpus to id "
        "arrays, report per-slice fitness (OOV + compression)",
    )
    tok.add_argument(
        "--op", required=True,
        choices=["train", "encode", "decode", "report", "utilization",
                 "prune"],
    )
    tok.add_argument("--model", required=True, help="tokenizer.json path")
    tok.add_argument("--input", required=True, help="corpus parquet")
    tok.add_argument("--output", default=None, help="encode: ids parquet path")
    tok.add_argument("--id-col", default="doc_id")
    tok.add_argument("--text-col", default="text")
    tok.add_argument("--lang-col", default="lang")
    tok.add_argument("--merges", type=int, default=1000, help="train: merge count")
    tok.add_argument(
        "--byte-level", action="store_true",
        help="train: GPT-2-style byte-level model (no unk, exact text "
        "round trip); encode/report detect the shape from the file",
    )
    tok.add_argument(
        "--unigram", action="store_true",
        help="train: unigram-LM model (sentencepiece/T5 family, EM over "
        "the word histogram) instead of BPE; sized by --vocab-size",
    )
    tok.add_argument(
        "--wordpiece", action="store_true",
        help="train: WordPiece model (BERT family, likelihood-scored "
        "merges over the BertPreTokenizer word histogram) instead of "
        "BPE; sized by --vocab-size",
    )
    tok.add_argument(
        "--vocab-size", type=int, default=8000,
        help="train --unigram/--wordpiece: target vocabulary size "
        "(incl. specials)",
    )
    tok.add_argument(
        "--sample-alpha", type=float, default=None,
        help="encode (Unigram models): subword-regularization inverse "
        "temperature — each piece occurrence samples its segmentation",
    )
    tok.add_argument(
        "--sample-seed", type=int, default=None,
        help="encode: seed for --sample-alpha's draws (BPE/Unigram "
        "only; None default so explicit use is always detectable)",
    )
    tok.add_argument(
        "--remap-output", default=None,
        help="prune: also write the (old_id, new_id) mapping parquet "
        "for re-encoding already-encoded corpora",
    )

    lm = sub.add_parser(
        "lm",
        help="n-gram LM lifecycle: train (KN or count-only) on a "
        "reference corpus, score documents by perplexity / Stupid "
        "Backoff, bucket head/middle/tail, or profile per-doc "
        "longest-match structure (integer SB diagnostics)",
    )
    lm.add_argument(
        "--op", required=True,
        choices=["train", "score", "merge", "prune", "profile"]
    )
    lm.add_argument("--model", required=True, help="LM directory (parquet tables + meta)")
    lm.add_argument(
        "--input", default=None,
        help="corpus parquet (train/score/profile) or comma-separated "
        "saved LM dirs (merge: fold incremental batches == "
        "whole-corpus retrain); unused by prune",
    )
    lm.add_argument(
        "--output", default=None,
        help="score/profile: output parquet; prune: pruned-model "
        "directory",
    )
    lm.add_argument("--id-col", default="doc_id")
    lm.add_argument("--text-col", default="text")
    lm.add_argument("--order", type=int, default=3, help="train: n-gram order")
    lm.add_argument(
        "--discount",
        type=lambda v: v if v == "auto" else float(v),
        default=0.75,
        help="train: KN discount D, or 'auto' for the per-order "
        "Ney/Chen-Goodman count-of-counts estimate",
    )
    lm.add_argument(
        "--min-count", type=int, default=1,
        help="train: tokens rarer than this become <unk> (open vocab)",
    )
    lm.add_argument(
        "--min-top-count", type=int, default=2,
        help="prune: drop top-order n-grams rarer than this (KenLM "
        "--prune; normalization-preserving, top order only)",
    )
    lm.add_argument(
        "--buckets", type=int, default=0,
        help="score: also assign this many equal-population perplexity "
        "buckets (CCNet's head/middle/tail = 3; 0 = off)",
    )
    lm.add_argument(
        "--buckets-method", choices=("exact", "approx"), default="exact",
        help="score --buckets: 'exact' = deterministic global-window "
        "cut (default; bit-stable across runs); 'approx' = "
        "approxQuantile thresholds + a codegen projection, NO global "
        "sort — the corpus-scale choice (populations equal to the "
        "operator's rel_err only)",
    )
    lm.add_argument(
        "--model-type", choices=("kn", "count-only"), default="kn",
        help="train: full Kneser-Ney model, or Brants count-only "
        "tables (sb_train — no discounting/vocab pass; scoreable "
        "with --scorer stupid-backoff only, mergeable, far cheaper "
        "at web scale)",
    )
    lm.add_argument(
        "--scorer", choices=("kn", "stupid-backoff"), default="kn",
        help="score: interpolated Kneser-Ney perplexity (normalized, "
        "the CCNet signal) or Stupid Backoff (Brants 2007 — raw "
        "count ratios + 0.4 backoff, half the joins; ranking-grade, "
        "not a probability)",
    )

    select = sub.add_parser(
        "select",
        help="DSIR data selection: importance-resample raw documents "
        "toward a target-domain sample (hashed n-gram models)",
    )
    select.add_argument("--target", required=True, help="target-domain sample parquet")
    select.add_argument("--input", required=True, help="raw corpus parquet")
    select.add_argument("--output", required=True, help="selection output parquet")
    select.add_argument("--k", type=int, default=None,
                        help="documents to draw (omit with --weights-only)")
    select.add_argument("--id-col", default="doc_id")
    select.add_argument("--text-col", default="text")
    select.add_argument("--n-buckets", type=int, default=10_000)
    select.add_argument("--seed", type=int, default=0)
    select.add_argument(
        "--weights-only", action="store_true",
        help="write every document's log importance weight instead of "
        "drawing a sample",
    )

    wds = sub.add_parser(
        "wds",
        help="WebDataset tar shards <-> parquet: import entry/sample "
        "rows from tar shards, or export binary-column rows back to "
        "deterministic tars",
    )
    wds.add_argument("--op", required=True, choices=["import", "export"])
    wds.add_argument("--input", required=True,
                     help="tar directory (import) / entries parquet (export)")
    wds.add_argument("--output", required=True,
                     help="parquet path (import) / tar directory (export)")
    wds.add_argument(
        "--extensions", default=None,
        help="import: comma-separated entry extensions to keep",
    )
    wds.add_argument(
        "--samples", action="store_true",
        help="import: one row per sample (ext->content map) instead of "
        "one row per entry",
    )
    wds.add_argument(
        "--on-error", default="raise", choices=["raise", "skip"],
        help="import: corrupt-shard policy",
    )

    pack = sub.add_parser(
        "pack",
        help="materialize fixed-context training rows from encoded "
        "token ids (tokenizer --op encode output): concat docs per "
        "budget, pad, keep doc boundaries",
    )
    pack.add_argument("--input", required=True, help="ids parquet (doc_id, token_ids)")
    pack.add_argument("--output", required=True, help="packed rows parquet")
    pack.add_argument("--context-len", type=int, required=True)
    pack.add_argument("--pad-id", type=int, default=0)
    pack.add_argument("--eos-id", type=int, default=None)
    pack.add_argument("--id-col", default="doc_id")
    pack.add_argument("--ids-col", default="token_ids")
    pack.add_argument(
        "--shard-hex-chars", type=int, default=1,
        help="parallelism = 16^n packing groups (0 = one global group)",
    )

    batchplan = sub.add_parser(
        "batchplan",
        help="length-bucketed PADDED batch assembly (the fixed-shape "
        "complement of `pack`): assign (bucket, shard, batch_idx, "
        "pad_to) per row and print the exact padding-waste report",
    )
    batchplan.add_argument("--input", required=True, help="measured parquet")
    batchplan.add_argument("--output", required=True, help="batches parquet path")
    batchplan.add_argument("--id-col", default="doc_id")
    batchplan.add_argument("--len-col", default="n_tokens")
    batchplan.add_argument("--batch-size", type=int, default=32)
    batchplan.add_argument(
        "--boundaries", default=None,
        help="comma-separated ascending bucket upper bounds "
        "(default: floor-log2 buckets)",
    )
    batchplan.add_argument(
        "--shard-hex", type=int, default=1,
        help="parallelism = 16^n shards per bucket (0 = exact global "
        "batching per bucket)",
    )
    batchplan.add_argument(
        "--order", default="length", choices=["length", "hash"],
        help="hash = the random-batch baseline, for pricing the sort",
    )
    batchplan.add_argument(
        "--report-output", default=None,
        help="also write the per-bucket padding report",
    )

    explain = sub.add_parser(
        "explain",
        help="print the formatted physical plan of a catalog query "
        "(the plan-audit loop: check pushed filters, codegen spans, "
        "join strategies, exchanges before shipping a change)",
    )
    explain.add_argument(
        "--query", required=True,
        help="catalog query name (see `queries()` in __spark_entry__)",
    )
    explain.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001",
        help="table directory the plan is resolved against",
    )

    compact = sub.add_parser(
        "compact",
        help="lake maintenance: merge each partition's small files to ~target size "
        "(the CRON-cadence flushes fragment the lake; run this periodically)",
    )
    compact.add_argument("--src", required=True, help="fragmented lake root")
    compact.add_argument("--dest", required=True, help="compacted output root (swap after)")
    compact.add_argument(
        "--partition-cols", required=True, help="comma-separated Hive partition columns"
    )
    compact.add_argument(
        "--target-file-mb", type=int, default=128, help="target output file size (MiB)"
    )

    table = sub.add_parser(
        "table", help="transaction-log table maintenance (txlog sink tables)"
    )
    table.add_argument("--path", required=True, help="table root (holds _log/)")
    table.add_argument(
        "--op",
        required=True,
        choices=["optimize", "vacuum", "history"],
        help="optimize: merge small live files transactionally; vacuum: "
        "checkpoint the log and reclaim dead files; history: print the commit trail",
    )
    table.add_argument(
        "--target-file-mb", type=int, default=128, help="optimize target size (MiB)"
    )
    table.add_argument(
        "--zorder",
        default=None,
        help="optimize: comma-separated numeric/date/timestamp columns to "
        "Z-order-cluster the rewrite on (multi-column data skipping)",
    )
    table.add_argument(
        "--min-age-hours",
        type=float,
        default=24.0,
        help="vacuum: never touch unreferenced staging younger than this",
    )

    args = parser.parse_args(argv)

    if args.cmd == "table" and args.op in ("vacuum", "history"):
        # log-only operations: no SparkSession needed
        from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
            table_history,
            vacuum,
        )

        if args.op == "history":
            for h in table_history(args.path):
                print(
                    f"v{h['version']:<4d} txn={h['txn_id'] or '-':<24s} "
                    f"+{h['n_added']} -{h['n_removed']}"
                    f"{'  [checkpoint]' if h['full'] else ''}"
                )
        else:
            stats = vacuum(args.path, min_age_seconds=args.min_age_hours * 3600.0)
            print(
                f"vacuumed: {stats['data_dirs_removed']} dirs, "
                f"{stats['data_files_removed']} files, "
                f"{stats['manifests_removed']} manifests; "
                f"checkpoint v{stats['checkpoint_version']}"
            )
        return 0

    from utc_cuip_kafka_aws_connector_spark.session import get_spark
    from utc_cuip_kafka_aws_connector_spark.sources.sinks import cloud_committer_conf

    extra_conf = cloud_committer_conf() if args.committer == "s3a-magic" else None
    spark = get_spark(app_name=args.cmd, extra_conf=extra_conf)
    if args.cmd == "ingest":
        route = run_ingest(
            spark, args.topic, args.input, args.output, args.format, args.backup_output
        )
        print(f"ingested topic={args.topic} route={route} output={args.output}")
    elif args.cmd == "ingest-config":
        routes = run_ingest_config(
            spark, args.config, args.input_root, args.output, args.format, args.backup_output
        )
        print(f"ingested {len(routes)} topics: {routes}")
    elif args.cmd == "table":  # op == optimize (needs Spark)
        from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
            ConcurrentWriteError,
            txn_optimize,
        )

        try:
            v = txn_optimize(
                spark,
                args.path,
                target_file_bytes=args.target_file_mb * 1024 * 1024,
                zorder_by=args.zorder.split(",") if args.zorder else None,
            )
        except ConcurrentWriteError:
            # txn_optimize already retried and cleaned its staging;
            # the table is hot -- report cleanly instead of a traceback.
            print(
                f"table {args.path} kept advancing under concurrent writes; "
                "re-run optimize when the write rate drops"
            )
            return 1
        print(f"optimized {args.path} -> v{v}")
    elif args.cmd == "curate":
        stats = run_curate(
            spark,
            args.input,
            args.output,
            id_col=args.id_col,
            text_col=args.text_col,
            lang_col=args.lang_col,
            min_quality=args.min_quality,
            keep_rates=args.keep_rates,
            default_rate=args.default_rate,
        )
        print(
            f"curated {args.input}: {stats['read']} read -> "
            f"{stats['survived']} survived, output={args.output}"
        )
    elif args.cmd == "curate-full":
        ndt = args.near_dup_threshold
        stats = run_curate_full(
            spark,
            args.input,
            args.output,
            id_col=args.id_col,
            text_col=args.text_col,
            lang_col=args.lang_col,
            url_col=args.url_col,
            select_target=args.select_target,
            select_k=args.select_k,
            select_buckets=args.select_buckets,
            select_method=args.select_method,
            html=args.html,
            strip_code_fences=args.strip_code_fences,
            para_dedup=args.para_dedup,
            boiler_min_docs=args.boiler_min_docs,
            substr_window=args.substr_window,
            gopher=args.gopher,
            c4=args.c4,
            min_quality=args.min_quality,
            langid_model=args.langid_model,
            classifier_model=args.classifier_model,
            classifier_min_p=args.classifier_min_p,
            ppl_lm=args.ppl_lm,
            ppl_max=args.ppl_max,
            ppl_quantile=args.ppl_quantile,
            near_dup_threshold=None if ndt < 0 else ndt,
            max_per_domain=args.max_per_domain,
            decontam_path=args.decontam,
            decontam_threshold=args.decontam_threshold,
            decontam_embeddings=args.decontam_embeddings,
            decontam_cosine=args.decontam_cosine,
            embedding_col=args.embedding_col,
            keep_rates=args.keep_rates,
            default_rate=args.default_rate,
            split_fractions=args.split,
            seed=args.seed,
        )
        funnel = " -> ".join(f"{name}:{n}" for name, n in stats["stages"])
        print(f"curate-full {funnel}, output={args.output}")
    elif args.cmd == "simjoin":
        stats = run_simjoin(
            spark,
            args.input,
            args.output,
            threshold=args.threshold,
            id_col=args.id_col,
            text_col=args.text_col,
            shingle=args.shingle,
        )
        print(
            f"simjoin {args.input}: {stats['read']} docs -> {stats['pairs']} "
            f"pairs at J>={args.threshold}, output={args.output}"
        )
    elif args.cmd == "retrieve":
        for r in run_retrieve(
            spark,
            args.input,
            args.query,
            k=args.k,
            id_col=args.id_col,
            text_col=args.text_col,
        ):
            print(f"{r['rnk']:>3d}  {r[args.id_col]:>12}  {r['score']:.6f}")
    elif args.cmd == "layout":
        stats = run_layout(
            spark,
            args.input,
            args.output,
            args.x_col,
            args.y_col,
            bits=args.bits,
            curve=args.curve,
        )
        print(
            f"laid out {stats['rows']} rows on the {args.curve} curve over "
            f"({args.x_col}, {args.y_col}), output={args.output}"
        )
    elif args.cmd == "perturb":
        from utc_cuip_kafka_aws_connector_spark.operators.perturb import (
            perturb_text,
        )

        noised = perturb_text(
            spark.read.parquet(args.input),
            id_col=args.id_col,
            text_col=args.text_col,
            rate=args.rate,
            seed=args.seed,
        )
        noised.write.mode("overwrite").parquet(args.output)
        back = spark.read.parquet(args.output)
        n_rows = back.count()
        n_edits = back.agg({"n_edits": "sum"}).first()[0] or 0
        print(
            f"perturbed {n_rows} docs ({n_edits} word edits, "
            f"rate={args.rate}, seed={args.seed}) -> {args.output}"
        )
    elif args.cmd == "order":
        from utc_cuip_kafka_aws_connector_spark.operators.icp import (
            incontext_order,
        )

        ordered = incontext_order(
            spark.read.parquet(args.input),
            id_col=args.id_col,
            vec_col=args.vec_col,
            n_clusters=args.n_clusters,
            max_cluster_size=args.max_cluster_size,
            seed=args.seed,
        )
        ordered.write.mode("overwrite").parquet(args.output)
        back = spark.read.parquet(args.output)
        n_rows = back.count()
        n_clusters = back.select("cluster_id").distinct().count()
        print(
            f"ordered {n_rows} docs across {n_clusters} clusters "
            f"(greedy NN chains) -> {args.output}"
        )
    elif args.cmd == "report":
        rows = run_report(
            spark,
            args.input,
            ppl_lm=args.ppl_lm,
            dsir_target=args.dsir_target,
            select_buckets=args.select_buckets,
            eval_embeddings=args.eval_embeddings,
            decontam_cosine=args.decontam_cosine,
            ppl_buckets_method=args.ppl_buckets_method,
            diversity_ns=tuple(
                int(x) for x in args.diversity_ns.split(",")
            ) if args.diversity_ns else None,
        )
        for r in rows:
            print(f"{r.metric:<28s} {r.value:.4f}")
    elif args.cmd == "release-report":
        rows = run_release_report(
            spark,
            args.old,
            args.new,
            ppl_lm=args.ppl_lm,
            dsir_target=args.dsir_target,
            select_buckets=args.select_buckets,
            eval_embeddings=args.eval_embeddings,
            decontam_cosine=args.decontam_cosine,
            drift_cols=args.drift_cols,
            ppl_buckets_method=args.ppl_buckets_method,
        )
        for r in rows:
            print(f"{r.metric:<36s} {r.value:.4f}")
    elif args.cmd == "normalize":
        stats = run_normalize(
            spark,
            args.input,
            args.output,
            lower=args.lower,
            strip_accents=args.strip_accents,
            form=args.form,
        )
        print(
            f"normalized {stats['rows']} docs ({args.form}"
            f"{', lower' if args.lower else ''}"
            f"{', strip-accents' if args.strip_accents else ''}), "
            f"output={args.output}"
        )
    elif args.cmd == "classify":
        stats = run_classify(
            spark,
            args.train,
            args.input,
            args.output,
            label_col=args.label_col,
            keep_label=args.keep_label,
            id_col=args.id_col,
            text_col=args.text_col,
            method=args.method,
            save_model=args.save_model,
        )
        if args.method == "lr":
            mode = f"p_keep vs {args.keep_label!r} (lr)"
        elif args.keep_label:
            mode = f"log-odds vs {args.keep_label!r}"
        else:
            mode = "predictions"
        print(
            f"classify: trained on {stats['train']} docs, wrote {mode} for "
            f"{stats['scored']} docs, output={args.output}"
        )
    elif args.cmd == "langid":
        from utc_cuip_kafka_aws_connector_spark.operators.langid import (
            langid_load,
            langid_predict,
            langid_save,
            langid_train,
        )

        if args.op == "train":
            df = spark.read.parquet(args.input)
            model = langid_train(
                df,
                text_col=args.text_col,
                label_col=args.label_col,
                n=args.char_n,
                n_features=args.n_features,
                alpha=args.alpha,
            )
            langid_save(model, args.model)
            n_labels = model["priors"].count()
            print(
                f"langid: trained char-{args.char_n}-gram NB on "
                f"{df.count()} docs / {n_labels} languages, "
                f"model={args.model}"
            )
        else:
            if not args.output:
                raise SystemExit("langid --op predict needs --output")
            model = langid_load(spark, args.model)
            df = spark.read.parquet(args.input)
            pred = langid_predict(
                df, model, id_col=args.id_col, text_col=args.text_col
            )
            pred.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            print(f"langid: predicted {n} docs, output={args.output}")
    elif args.cmd == "hotkeys":
        stats = run_hotkeys(
            spark,
            args.input,
            args.column,
            k=args.k,
            rows_per_task=args.rows_per_task,
        )
        if not stats["hitters"]:
            print(f"hotkeys: no value of {args.column} exceeds n/{args.k}")
        for r in stats["hitters"]:
            print(f"{r['freq']:>12d}  {r[args.column]}")
        if stats["salt_buckets"] is not None:
            print(f"suggested salt buckets: {stats['salt_buckets']}")
    elif args.cmd == "clean":
        from utc_cuip_kafka_aws_connector_spark.operators.boilerplate import (
            strip_boilerplate,
        )
        from utc_cuip_kafka_aws_connector_spark.operators.extract import (
            html_to_text,
        )
        from utc_cuip_kafka_aws_connector_spark.operators.substrdedup import (
            strip_duplicate_spans,
        )

        df = spark.read.parquet(args.input)
        n_in = df.count()
        if args.html:
            df = html_to_text(df, text_col=args.text_col)
        if args.strip_code_fences:
            from utc_cuip_kafka_aws_connector_spark.operators.mdsplit import (
                split_code_fences,
            )

            _require_cols_absent(
                df,
                ("prose", "code_blocks", "code_ratio"),
                "--strip-code-fences",
            )
            df = (
                split_code_fences(df, text_col=args.text_col)
                .drop(args.text_col, "code_blocks", "code_ratio")
                .withColumnRenamed("prose", args.text_col)
            )
        if args.para_dedup:
            from utc_cuip_kafka_aws_connector_spark.operators.intradedup import (
                dedup_paragraphs,
            )

            _require_cols_absent(df, ("paras_removed",), "--para-dedup")
            df = dedup_paragraphs(df, text_col=args.text_col).drop(
                "paras_removed"
            )
        df = strip_boilerplate(
            df,
            id_col=args.id_col,
            text_col=args.text_col,
            min_docs=args.boiler_min_docs,
        )
        if args.substr_window:
            df = strip_duplicate_spans(
                df,
                id_col=args.id_col,
                text_col=args.text_col,
                window=args.substr_window,
            )
        stages = []
        if args.c4:
            from utc_cuip_kafka_aws_connector_spark.operators.rulefilters import (
                apply_c4,
            )

            df = apply_c4(df, text_col=args.text_col)
            stages.append("c4")
        if args.gopher:
            from utc_cuip_kafka_aws_connector_spark.operators.rulefilters import (
                apply_gopher,
            )

            df = apply_gopher(df, text_col=args.text_col)
            stages.append("gopher")
        if args.url_col:
            from utc_cuip_kafka_aws_connector_spark.operators.urlops import (
                normalize_url,
                per_domain_cap,
            )
            from pyspark.sql import functions as _F

            df = df.withColumn(args.url_col, normalize_url(args.url_col))
            if args.max_per_domain:
                df = per_domain_cap(
                    df,
                    url_col=args.url_col,
                    max_per_domain=args.max_per_domain,
                    id_col=args.id_col,
                )
            stages.append("url")
        elif args.max_per_domain:
            parser.error("--max-per-domain requires --url-col")
        df.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        print(
            f"cleaned {n_in} -> {n_out} docs"
            + (" (html extracted)" if args.html else "")
            + f", boilerplate min_docs={args.boiler_min_docs}"
            + (
                f", substr window={args.substr_window}"
                if args.substr_window
                else ""
            )
            + (f", rules: {'+'.join(stages)}" if stages else "")
            + f", output={args.output}"
        )
    elif args.cmd == "ann":
        from utc_cuip_kafka_aws_connector_spark.operators.annindex import (
            ann_fit,
            ann_load,
            ann_save,
            ann_search,
        )

        if args.op == "build":
            if not args.input:
                parser.error("ann --op build requires --input")
            df = spark.read.parquet(args.input)
            index = ann_fit(
                df,
                id_col=args.id_col,
                vec_col=args.vec_col,
                k_pca=args.pca,
                n_cells=args.cells,
                m=args.m,
                nbits=args.nbits,
            )
            ann_save(spark, df, index, args.path)
            print(
                f"built ann index at {args.path}: cells={args.cells} "
                f"m={args.m} nbits={args.nbits}"
                + (f" pca={args.pca}" if args.pca else "")
            )
        elif args.op == "vacuum":
            from utc_cuip_kafka_aws_connector_spark.operators.annindex import (
                ann_vacuum,
            )

            if not args.dest:
                parser.error("ann --op vacuum requires --dest")
            dels = (
                spark.read.parquet(args.delete_ids) if args.delete_ids else None
            )
            stats = ann_vacuum(spark, args.path, args.dest, delete_ids=dels)
            print(
                f"vacuumed {args.path} -> {args.dest}: kept "
                f"{stats['rows_kept']}, dropped {stats['rows_dropped']}, "
                f"files {stats['files_before']} -> {stats['files_after']} "
                "(swap the directories when satisfied)"
            )
        else:
            if not args.query:
                parser.error("ann --op search requires --query")
            q = [float(x) for x in args.query.split(",")]
            index, coded, vectors = ann_load(spark, args.path)
            rows = ann_search(
                index, coded, q, k=args.k, nprobe=args.nprobe, vectors=vectors
            ).collect()
            for r in rows:
                print(f"{r[index['id_col']]:>12d}  dist={r['dist']:.6f}")
    elif args.cmd == "mine":
        if args.id_col is None:
            args.id_col = (
                "doc_id"
                if args.op in ("positives", "corrupt", "fim")
                else "vec_id"
            )
        if args.op == "negatives":
            from utc_cuip_kafka_aws_connector_spark.operators.negatives import (
                hard_negatives,
            )

            corpus = spark.read.parquet(args.input)
            anchors = (
                spark.read.parquet(args.anchors) if args.anchors else None
            )
            pairs = hard_negatives(
                corpus,
                k=args.k,
                id_col=args.id_col,
                vec_col=args.vec_col,
                label_col=args.label_col,
                anchors=anchors,
                method=args.method,
                n_centroids=args.cells,
                nprobe=args.nprobe,
                centroid_source=args.centroid_source,
            )
            pairs.write.mode("overwrite").parquet(args.output)
            out = spark.read.parquet(args.output)
            n_pairs = out.count()
            n_anchors = out.select("anchor_id").distinct().count()
            print(
                f"mined {n_pairs} hard negatives for {n_anchors} anchors "
                f"(k={args.k}, method={args.method}) -> {args.output}"
            )
        elif args.op == "fim":
            from utc_cuip_kafka_aws_connector_spark.operators.fim import (
                fim_transform,
            )

            out_df = fim_transform(
                spark.read.parquet(args.input),
                id_col=args.id_col,
                text_col=args.text_col,
                rate=args.rate_fim,
                spm_rate=args.spm_rate,
                seed=args.seed,
            )
            out_df.write.mode("overwrite").parquet(args.output)
            back = spark.read.parquet(args.output)
            n_all = back.count()
            n_fim = back.filter("fim_applied").count()
            print(
                f"FIM-transformed {n_fim}/{n_all} docs "
                f"(rate={args.rate_fim}, spm_rate={args.spm_rate}, "
                f"seed={args.seed}) -> {args.output}"
            )
        elif args.op == "corrupt":
            from utc_cuip_kafka_aws_connector_spark.operators.corruption import (
                span_corruption,
            )

            pairs = span_corruption(
                spark.read.parquet(args.input),
                id_col=args.id_col,
                text_col=args.text_col,
                corruption_rate=args.rate,
                mean_span=args.mean_span,
                seed=args.seed,
            )
            pairs.write.mode("overwrite").parquet(args.output)
            n_pairs = spark.read.parquet(args.output).count()
            print(
                f"built {n_pairs} span-corruption examples "
                f"(rate={args.rate}, mean_span={args.mean_span}, "
                f"seed={args.seed}) -> {args.output}"
            )
        elif args.op == "positives":
            from utc_cuip_kafka_aws_connector_spark.operators.crops import (
                positive_pairs,
            )

            pairs = positive_pairs(
                spark.read.parquet(args.input),
                id_col=args.id_col,
                text_col=args.text_col,
                strategy=args.pair_op,
                min_tokens=args.min_tokens,
                max_tokens=args.max_tokens,
                seed=args.seed,
            )
            pairs.write.mode("overwrite").parquet(args.output)
            n_pairs = spark.read.parquet(args.output).count()
            print(
                f"mined {n_pairs} positive pairs ({args.pair_op}, "
                f"tokens {args.min_tokens}-{args.max_tokens}, "
                f"seed={args.seed}) -> {args.output}"
            )
        else:  # bitext
            from utc_cuip_kafka_aws_connector_spark.operators.bitext import (
                mine_bitext,
            )

            if not args.target:
                parser.error("mine --op bitext requires --target")
            pairs = mine_bitext(
                spark.read.parquet(args.input),
                spark.read.parquet(args.target),
                k=args.k,
                threshold=args.threshold,
                strategy=args.strategy,
                id_col=args.id_col,
                vec_col=args.vec_col,
                method=args.method,
                n_centroids=args.cells,
                nprobe=args.nprobe,
                centroid_source=args.centroid_source,
            )
            pairs.write.mode("overwrite").parquet(args.output)
            n_pairs = spark.read.parquet(args.output).count()
            print(
                f"mined {n_pairs} bitext pairs (k={args.k}, "
                f"threshold={args.threshold}, strategy={args.strategy}, "
                f"method={args.method}) -> {args.output}"
            )
    elif args.cmd == "pairs":
        from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
            preference_pairs,
            prompt_response_stats,
        )

        responses = spark.read.parquet(args.input)
        built = preference_pairs(
            responses,
            prompt_col=args.prompt_col,
            id_col=args.id_col,
            score_col=args.score_col,
            text_col=args.text_col,
            strategy=args.strategy,
            min_margin=args.min_margin,
            max_pairs_per_prompt=args.max_per_prompt,
        )
        built.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        n_pairs = out.count()
        n_prompts = out.select("prompt").distinct().count()
        print(
            f"built {n_pairs} preference pairs over {n_prompts} prompts "
            f"(strategy={args.strategy}, min_margin={args.min_margin}) "
            f"-> {args.output}"
        )
        if args.stats_output:
            prompt_response_stats(
                responses,
                prompt_col=args.prompt_col,
                id_col=args.id_col,
                score_col=args.score_col,
            ).write.mode("overwrite").parquet(args.stats_output)
            print(f"wrote per-prompt stats -> {args.stats_output}")
    elif args.cmd == "bestof":
        from utc_cuip_kafka_aws_connector_spark.operators.prefpairs import (
            best_of_n,
        )

        winners = best_of_n(
            spark.read.parquet(args.input),
            prompt_col=args.prompt_col,
            id_col=args.id_col,
            score_col=args.score_col,
            text_col=args.text_col,
            n=args.n,
            min_score=args.min_score,
        )
        winners.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        n_rows = out.count()
        n_prompts = out.select("prompt").distinct().count()
        thr = f", min_score={args.min_score}" if args.min_score is not None else ""
        print(
            f"best-of-n kept {n_rows} responses over {n_prompts} prompts "
            f"(n={args.n}{thr}) -> {args.output}"
        )
    elif args.cmd == "batchplan":
        from utc_cuip_kafka_aws_connector_spark.operators.lenbatch import (
            bucketed_batches,
            padding_report,
        )

        bounds = (
            [int(b) for b in args.boundaries.split(",")]
            if args.boundaries
            else None
        )
        planned = bucketed_batches(
            spark.read.parquet(args.input),
            id_col=args.id_col,
            len_col=args.len_col,
            batch_size=args.batch_size,
            boundaries=bounds,
            shard_hex=args.shard_hex,
            order=args.order,
        )
        planned.write.mode("overwrite").parquet(args.output)
        written = spark.read.parquet(args.output)
        rep = padding_report(written, len_col=args.len_col).head()
        if not rep["n_rows"]:
            # empty input, or every row failed eligibility (null ids,
            # null/non-positive lengths): the global aggregate row
            # carries NULL sums, which would crash the format below
            print(
                f"batchplan: 0 eligible rows (nothing to batch) "
                f"-> {args.output}"
            )
        else:
            print(
                f"batchplan: {rep['n_rows']} rows in {rep['n_batches']} "
                f"batches ({rep['n_remainder_batches']} remainders), "
                f"waste_frac={rep['waste_frac']:.4f} "
                f"(pad {rep['pad_tokens']} / real {rep['real_tokens']}) "
                f"-> {args.output}"
            )
        if args.report_output:
            padding_report(
                written, len_col=args.len_col, by_bucket=True
            ).write.mode("overwrite").parquet(args.report_output)
            print(f"wrote per-bucket report -> {args.report_output}")
    elif args.cmd == "chat":
        from utc_cuip_kafka_aws_connector_spark.operators import (
            conversations as conv_ops,
        )

        convs = spark.read.parquet(args.input)
        if args.op == "validate":
            res = conv_ops.conversation_flags(convs, args.turns_col)
            if args.valid_only:
                res = res.filter("cv_valid")
        elif args.op == "render":
            res = conv_ops.render_chat(
                convs, args.turns_col, template=args.template
            )
        elif args.op == "stats":
            res = conv_ops.conversation_stats(convs, args.turns_col)
        elif args.op == "dedup":
            res = conv_ops.dedup_conversations(
                convs, args.id_col, args.turns_col
            )
        else:  # truncate
            if args.max_tokens is None:
                parser.error("chat --op truncate requires --max-tokens")
            res = conv_ops.truncate_to_budget(
                convs, args.max_tokens, turns_col=args.turns_col
            )
        res.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        print(f"chat {args.op}: {n_out} conversations -> {args.output}")
    elif args.cmd == "sample":
        from utc_cuip_kafka_aws_connector_spark.operators.reservoir import (
            weighted_sample_n,
            weighted_sample_targets,
        )

        if (args.n is None) == (args.targets is None):
            parser.error("sample requires exactly one of --n / --targets")
        if args.targets:
            if not args.strata_col:
                parser.error("sample --targets requires --strata-col")
            drawn = weighted_sample_targets(
                spark.read.parquet(args.input),
                spark.read.parquet(args.targets),
                id_col=args.id_col,
                weight_col=args.weight_col,
                strata_col=args.strata_col,
                target_col=args.target_col,
                seed=args.seed,
                key_col=args.key_col,
            )
            scope = f"targets table per {args.strata_col!r}"
        else:
            drawn = weighted_sample_n(
                spark.read.parquet(args.input),
                args.n,
                id_col=args.id_col,
                weight_col=args.weight_col,
                strata_col=args.strata_col,
                seed=args.seed,
                key_col=args.key_col,
            )
            scope = (
                f"n={args.n} per {args.strata_col!r} stratum"
                if args.strata_col
                else f"n={args.n} global"
            )
        drawn.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        print(
            f"drew {n_out} rows without replacement ({scope}, "
            f"seed={args.seed}) -> {args.output}"
        )
    elif args.cmd == "mix":
        if args.op == "unimax":
            from utc_cuip_kafka_aws_connector_spark.operators.unimax import (
                unimax_allocation,
            )

            if args.budget is None:
                parser.error("mix --op unimax requires --budget")
            weights = unimax_allocation(
                spark.read.parquet(args.input),
                args.budget,
                group_col=args.group_col,
                size_col=args.size_col,
                max_epochs=args.max_epochs,
                pre_aggregated=args.pre_aggregated,
            )
        elif args.op == "doremi":
            from utc_cuip_kafka_aws_connector_spark.operators.doremi import (
                domain_excess_loss,
                doremi_weights,
            )

            losses = spark.read.parquet(args.input)
            if not args.pre_aggregated:
                losses = domain_excess_loss(
                    losses,
                    domain_col=args.group_col,
                    proxy_loss_col=args.proxy_loss_col,
                    ref_loss_col=args.ref_loss_col,
                    step_col=args.step_col,
                )
            weights = doremi_weights(
                losses,
                domain_col=args.group_col,
                step_col=args.step_col,
                lr=args.lr,
                smoothing=args.smoothing,
                n_iter=args.iters,
            )
        else:  # temperature
            from pyspark.sql import functions as _Fm

            from utc_cuip_kafka_aws_connector_spark.operators.sampling import (
                temperature_weights,
            )

            sizes = spark.read.parquet(args.input)
            if not args.pre_aggregated:
                # temperature_weights' contract is one row per group;
                # the corpus aggregation is the caller's job (its
                # docstring) — here the CLI is that caller
                sizes = sizes.groupBy(args.group_col).agg(
                    _Fm.sum(args.size_col).alias(args.size_col)
                )
            weights = temperature_weights(
                sizes,
                group_col=args.group_col,
                size_col=args.size_col,
                tau=args.tau,
                budget=int(args.budget) if args.budget else None,
            )
        weights.write.mode("overwrite").parquet(args.output)
        n_groups = spark.read.parquet(args.output).count()
        print(
            f"mix {args.op}: weights for {n_groups} groups -> {args.output}"
        )
    elif args.cmd == "epochs":
        from pyspark.sql import functions as _Fe

        from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
            allocation_from_weights,
            materialize_epochs,
        )

        corpus = spark.read.parquet(args.input)
        alloc_df = spark.read.parquet(args.alloc)
        epochs_col = args.epochs_col
        if args.budget is not None:
            # allocation_from_weights always emits 'epochs'; a custom
            # --epochs-col names a column of the WEIGHTS table that
            # the conversion replaces, so the combination is a
            # config contradiction, not a rename (ADVICE r17)
            if args.epochs_col != "epochs":
                parser.error(
                    "--budget converts weights to an allocation whose "
                    "epochs column is named 'epochs'; --epochs-col "
                    f"{args.epochs_col!r} cannot apply — drop it (use "
                    "--weight-col to name the weights column)"
                )
            epochs_col = "epochs"
            size_expr = (
                _Fe.sum(_Fe.col(args.size_col).cast("double"))
                if args.size_col
                else _Fe.count(_Fe.lit(1)).cast("double")
            )
            group_sizes = corpus.groupBy(args.group_col).agg(
                size_expr.alias("__sz")
            )
            alloc_df = allocation_from_weights(
                alloc_df,
                group_sizes,
                budget=args.budget,
                group_col=args.group_col,
                weight_col=args.weight_col,
                size_col="__sz",
                max_epochs=args.max_epochs,
            )
        out_rows = materialize_epochs(
            corpus,
            alloc_df,
            group_col=args.group_col,
            epochs_col=epochs_col,
            id_col=args.id_col,
            salt=args.salt,
        )
        out_rows.write.mode("overwrite").parquet(args.output)
        written = spark.read.parquet(args.output)
        n = written.count()
        n_groups = written.select(args.group_col).distinct().count()
        print(
            f"epochs: materialized {n} rows across {n_groups} groups "
            f"-> {args.output}"
        )
    elif args.cmd == "trainset":
        from pyspark.sql import functions as _Ft

        from utc_cuip_kafka_aws_connector_spark.operators.shardwrite import (
            verify_shards,
        )
        from utc_cuip_kafka_aws_connector_spark.operators.trainset import (
            packed_training_shards,
            padded_training_shards,
        )

        corpus = spark.read.parquet(args.input)
        alloc_df = spark.read.parquet(args.alloc)
        if args.budget is not None:
            # the epochs verb's weights->allocation conversion, sized
            # by token mass (the budget is a TOKEN budget here — the
            # unit trainers actually plan in)
            if args.epochs_col != "epochs":
                parser.error(
                    "--budget converts weights to an allocation whose "
                    "epochs column is named 'epochs'; --epochs-col "
                    f"{args.epochs_col!r} cannot apply (use "
                    "--weight-col to name the weights column)"
                )
            from utc_cuip_kafka_aws_connector_spark.operators.epochs import (
                allocation_from_weights,
            )

            group_sizes = corpus.groupBy(args.group_col).agg(
                _Ft.sum(_Ft.size(args.ids_col)).cast("double").alias("__sz")
            )
            alloc_df = allocation_from_weights(
                alloc_df,
                group_sizes,
                budget=args.budget,
                group_col=args.group_col,
                weight_col=args.weight_col,
                size_col="__sz",
                max_epochs=args.max_epochs,
            )
        if args.mode == "packed":
            if args.context_len is None:
                parser.error("trainset --mode packed requires --context-len")
            manifest = packed_training_shards(
                corpus, alloc_df, args.output,
                context_len=args.context_len,
                pad_id=args.pad_id,
                eos_id=args.eos_id,
                group_col=args.group_col,
                epochs_col=args.epochs_col,
                id_col=args.id_col,
                ids_col=args.ids_col,
                salt=args.salt,
                shuffle_seed=args.shuffle_seed,
                hex_chars=args.hex_chars,
                validate_unique_ids=not args.no_validate_ids,
            )
            idc, tok, shard_key = "seq_id", "input_ids", "shard"
        else:
            bounds = (
                [int(b) for b in args.boundaries.split(",")]
                if args.boundaries
                else None
            )
            manifest = padded_training_shards(
                corpus, alloc_df, args.output,
                batch_size=args.batch_size,
                boundaries=bounds,
                shard_hex=args.shard_hex,
                order=args.order,
                group_col=args.group_col,
                epochs_col=args.epochs_col,
                id_col=args.id_col,
                ids_col=args.ids_col,
                salt=args.salt,
                shuffle_seed=args.shuffle_seed,
                validate_unique_ids=not args.no_validate_ids,
            )
            idc, tok, shard_key = "example_id", args.ids_col, "train_shard"
        # the builders return the WRITTEN manifest (already read back
        # from disk) — aggregate it directly, no second read
        totals = manifest.agg(
            _Ft.count(_Ft.lit(1)).alias("shards"),
            _Ft.sum("n_docs").alias("rows"),
            _Ft.sum("n_tokens").alias("tokens"),
        ).first()
        bad = verify_shards(spark, args.output, idc, tok, shard_key).count()
        if bad:
            print(
                f"trainset[{args.mode}]: VERIFICATION FAILED — {bad} "
                f"manifest row(s) disagree with the written shards at "
                f"{args.output}"
            )
            return 1
        print(
            f"trainset[{args.mode}]: {totals['rows']} examples / "
            f"{totals['tokens']} tokens in {totals['shards']} shards, "
            f"manifest verified -> {args.output}"
        )
    elif args.cmd == "curve":
        from utc_cuip_kafka_aws_connector_spark.operators.retention import (
            retention_curve,
        )

        curve_df = spark.read.parquet(args.input)
        curve_score = args.score_col
        if args.normalize:
            if not args.group_col:
                parser.error("curve --normalize requires --group-col")
            from utc_cuip_kafka_aws_connector_spark.operators.scorenorm import (
                normalize_scores,
            )

            curve_df = normalize_scores(
                curve_df, args.score_col, args.group_col,
                method=args.normalize, out_col="__score_norm",
            )
            curve_score = "__score_norm"
        out_curve = retention_curve(
            curve_df,
            curve_score,
            args.lo,
            args.hi,
            n_points=args.points,
            weight_col=args.weight_col,
            group_col=args.group_col,
            max_groups=args.max_groups,
        )
        out_curve.write.mode("overwrite").parquet(args.output)
        n_rows = spark.read.parquet(args.output).count()
        print(
            f"retention curve: {n_rows} grid rows "
            f"({args.points + 1} thresholds in [{args.lo}, {args.hi}]) "
            f"-> {args.output}"
        )
    elif args.cmd == "tokenizer":
        from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
            load_tokenizer_spec,
            save_tokenizer,
            tokenizer_report_spec,
        )

        df = spark.read.parquet(args.input)
        if args.op == "train":
            picked = [
                f for f, on in (
                    ("--unigram", args.unigram),
                    ("--wordpiece", args.wordpiece),
                    ("--byte-level", args.byte_level),
                ) if on
            ]
            if len(picked) > 1:
                parser.error(
                    f"{' and '.join(picked)} are exclusive model "
                    "families — pick one (or none for plain BPE)"
                )
            if args.wordpiece:
                from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
                    save_wordpiece_tokenizer,
                    wordpiece_train,
                )

                wvocab = wordpiece_train(
                    df, args.vocab_size, text_col=args.text_col
                )
                save_wordpiece_tokenizer(spark, args.model, wvocab)
                print(
                    f"trained WordPiece: vocab {len(wvocab)}, "
                    f"model={args.model}"
                )
            elif args.unigram:
                from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
                    save_unigram_tokenizer,
                )
                from utc_cuip_kafka_aws_connector_spark.operators.unigram import (
                    unigram_train,
                )

                vocab_scores = unigram_train(
                    df, args.vocab_size, text_col=args.text_col
                )
                save_unigram_tokenizer(spark, args.model, vocab_scores)
                print(
                    f"trained Unigram: vocab {len(vocab_scores)}, "
                    f"model={args.model}"
                )
            elif args.byte_level:
                from utc_cuip_kafka_aws_connector_spark.operators.bytelevel import (
                    byte_level_train,
                    byte_level_vocab,
                )

                mdf = byte_level_train(df, args.merges, text_col=args.text_col)
                merges = [
                    (r.lhs, r.rhs) for r in mdf.orderBy("merge_rank").collect()
                ]
                vocab = byte_level_vocab(merges)
                save_tokenizer(spark, args.model, merges, vocab, byte_level=True)
            else:
                from utc_cuip_kafka_aws_connector_spark.operators.bpetrain import (
                    bpe_train_merges,
                )
                from utc_cuip_kafka_aws_connector_spark.operators.encode import (
                    bpe_vocab,
                    corpus_chars,
                )

                merges = bpe_train_merges(df, args.merges, text_col=args.text_col)
                vocab = bpe_vocab(merges, corpus_chars(df, text_col=args.text_col))
                save_tokenizer(spark, args.model, merges, vocab)
            if not args.unigram and not args.wordpiece:
                print(
                    f"trained {'byte-level ' if args.byte_level else ''}BPE: "
                    f"{len(merges)} merges, vocab {len(vocab)}, model={args.model}"
                )
        elif args.op == "decode":
            from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
                decode_for_spec,
            )

            if not args.output:
                parser.error("tokenizer --op decode requires --output")
            spec = load_tokenizer_spec(spark, args.model)
            texts = decode_for_spec(df, spec, id_col=args.id_col)
            texts.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            print(f"decoded {n} docs with {args.model}, output={args.output}")
        elif args.op == "encode":
            from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
                encode_for_spec,
            )
            from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
                WordPieceSpec,
            )

            if not args.output:
                parser.error("tokenizer --op encode requires --output")
            # model-type routing lives in load_tokenizer_spec since
            # r19 (it returns a WordPieceSpec for BERT-family files) —
            # a malformed file hits tokenio's "must be one JSON
            # object" error instead of ad-hoc sniffing here, and
            # encode_for_spec owns the family dispatch + the
            # sampling-knob refusal for the deterministic kernel
            spec = load_tokenizer_spec(spark, args.model)
            # the one encode_for_spec refusal that IS CLI misuse —
            # asking the deterministic WordPiece kernel for BPE/
            # Unigram sampling knobs — routes through parser.error
            # as an explicit pre-check; every other ValueError out
            # of the encoder is a genuine internal error and must
            # propagate, not masquerade as usage (ADVICE r19: the
            # old blanket `except ValueError` masked both alike)
            if isinstance(spec, WordPieceSpec):
                knobs = [
                    name
                    for name, v in (
                        ("--sample-alpha", args.sample_alpha),
                        ("--sample-seed", args.sample_seed),
                    )
                    if v is not None
                ]
                if knobs:
                    parser.error(
                        f"{'/'.join(knobs)} only appl"
                        f"{'y' if len(knobs) > 1 else 'ies'} to "
                        "BPE/Unigram models (subword regularization); "
                        "WordPiece encoding is deterministic"
                    )
            ids = encode_for_spec(
                df,
                spec,
                id_col=args.id_col,
                text_col=args.text_col,
                sample_alpha=args.sample_alpha,
                sample_seed=args.sample_seed,
            )
            shape = (
                "WordPiece"
                if isinstance(spec, WordPieceSpec)
                else ("byte-level BPE" if spec.byte_level else spec.model_type)
            )
            ids.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            print(
                f"encoded {n} docs with {args.model} ({shape}), "
                f"output={args.output}"
            )
        elif args.op == "prune":
            from utc_cuip_kafka_aws_connector_spark.operators.vocabprune import (
                prune_to_corpus,
            )

            if not args.output:
                parser.error("tokenizer --op prune requires --output "
                             "(the pruned tokenizer.json path)")
            spec = load_tokenizer_spec(spark, args.model)
            from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
                WordPieceSpec as _WPSpec,
            )

            if isinstance(spec, _WPSpec):
                # WordPiece prune (r19): same measured-ids contract,
                # its own survival floor (##-continuation alphabet,
                # no merge closure), serialized back through the
                # loader's own round-trip writer
                from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
                    _fs_write_text as _fsw_wp,
                )
                from utc_cuip_kafka_aws_connector_spark.operators.wptrain import (
                    wordpiece_spec_json,
                    wordpiece_template_refusal,
                )

                # refuse unserializable template shapes BEFORE the
                # corpus encode pass, the same up-front discipline as
                # the BPE branch below (ADVICE r19: the writer's own
                # raise only fired after prune_to_corpus had already
                # scanned the whole corpus); the message is the
                # writer's, so the two guards can never diverge
                refusal = wordpiece_template_refusal(spec)
                if refusal is not None:
                    parser.error(
                        f"tokenizer --op prune: {refusal}; prune "
                        "programmatically via operators.vocabprune."
                        "prune_to_corpus instead"
                    )
                pruned, remap = prune_to_corpus(
                    df, spec, id_col=args.id_col, text_col=args.text_col
                )
                _fsw_wp(spark, args.output, wordpiece_spec_json(pruned))
                if args.remap_output:
                    spark.createDataFrame(
                        sorted(remap.items()), "old_id int, new_id int"
                    ).write.mode("overwrite").parquet(args.remap_output)
                print(
                    f"pruned WordPiece vocab {len(spec.vocab)} -> "
                    f"{len(pruned.vocab)} to this corpus; "
                    f"model={args.output}"
                    + (f"; id remap -> {args.remap_output}"
                       if args.remap_output else "")
                )
                return 0
            # save_tokenizer writes merges/vocab/byte_level/
            # add_prefix_space/unk ONLY — refuse specs whose other
            # sections it would silently drop (a written file that
            # encodes differently from the in-memory pruned spec is
            # worse than no file)
            unsupported = []
            if getattr(spec, "normalizers", ()):
                unsupported.append("normalizers")
            if getattr(spec, "split_mode", "whitespace") != "whitespace":
                unsupported.append(f"split_mode={spec.split_mode!r}")
            if getattr(spec, "byte_fallback", False):
                unsupported.append("byte_fallback")
            if getattr(spec, "added_tokens", {}):
                unsupported.append("added_tokens")
            if getattr(spec, "special_prefix", []) or getattr(
                spec, "special_suffix", []
            ):
                unsupported.append("TemplateProcessing specials")
            if unsupported:
                parser.error(
                    "tokenizer --op prune cannot serialize this spec "
                    f"faithfully ({', '.join(unsupported)} are outside "
                    "save_tokenizer's format); prune programmatically "
                    "via operators.vocabprune.prune_to_corpus instead"
                )
            pruned, remap = prune_to_corpus(
                df, spec, id_col=args.id_col, text_col=args.text_col
            )
            from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
                to_tokenizer_json as _to_json,
                _fs_write_text as _fsw,
            )

            _fsw(
                spark,
                args.output,
                _to_json(
                    pruned.merges,
                    pruned.vocab,
                    byte_level=pruned.byte_level,
                    add_prefix_space=pruned.add_prefix_space,
                    unk_token=pruned.unk_token,
                ),
            )
            if args.remap_output:
                spark.createDataFrame(
                    sorted(remap.items()), "old_id int, new_id int"
                ).write.mode("overwrite").parquet(args.remap_output)
            print(
                f"pruned vocab {len(spec.vocab)} -> {len(pruned.vocab)} "
                f"({len(spec.merges)} -> {len(pruned.merges)} merges) "
                f"to this corpus; model={args.output}"
                + (f"; id remap -> {args.remap_output}"
                   if args.remap_output else "")
            )
        elif args.op == "utilization":
            from utc_cuip_kafka_aws_connector_spark.operators.tokeval import (
                vocab_utilization,
            )

            spec = load_tokenizer_spec(spark, args.model)
            group = args.lang_col if args.lang_col in df.columns else None
            rows = vocab_utilization(
                df,
                spec,
                group_col=group,
                id_col=args.id_col,
                text_col=args.text_col,
            ).collect()
            def _fmt(v, spec_s):
                # zero-token groups report NULL ratios by contract
                return "n/a" if v is None else format(v, spec_s)

            for r in rows:
                slice_name = getattr(r, group, "(all)") if group else "(all)"
                print(
                    f"{slice_name:>8}  ids={r.distinct_ids:<7} "
                    f"coverage={r.vocab_coverage:.4f}  "
                    f"head10%={_fmt(r.top_decile_mass, '.4f')}  "
                    f"singletons={r.singleton_ids:<7} "
                    f"bytes/token={_fmt(r.bytes_per_token, '.2f')}"
                )
        else:  # report
            spec = load_tokenizer_spec(spark, args.model)
            rows = tokenizer_report_spec(
                df,
                spec,
                id_col=args.id_col,
                text_col=args.text_col,
                slice_col=args.lang_col,
            ).collect()
            for r in rows:
                slice_name = getattr(r, args.lang_col, "(all)")
                print(
                    f"{slice_name:>8}  docs={r.n_docs:<8} tokens={r.n_tokens:<10} "
                    f"oov={r.oov_rate:.4f}  chars/token={r.chars_per_token:.2f}  "
                    f"tokens/word={r.tokens_per_word:.2f}"
                )
    elif args.cmd == "lm":
        from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
            kn_merge,
            kn_score,
            kn_train,
            load_kn_lm,
            perplexity_buckets,
            save_kn_lm,
        )

        if args.op != "prune" and not args.input:
            parser.error(f"lm --op {args.op} requires --input")
        if args.op == "profile":
            from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
                sb_match_profile,
            )

            if not args.output:
                parser.error("lm --op profile requires --output")
            model = load_kn_lm(spark, args.model)
            prof = sb_match_profile(
                spark.read.parquet(args.input), model,
                text_col=args.text_col, id_col=args.id_col,
            )
            prof.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            print(
                f"profiled {n} docs under {args.model} "
                f"(order {model['order']}: per-doc longest-match "
                f"level counts), output={args.output}"
            )
            return 0
        if args.op == "prune":
            from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
                kn_prune,
            )

            if not args.output:
                parser.error("lm --op prune requires --output (pruned model dir)")
            pruned = kn_prune(
                load_kn_lm(spark, args.model), args.min_top_count
            )
            save_kn_lm(pruned, args.output)
            print(
                f"pruned {args.model} at min_top_count="
                f"{args.min_top_count} (order {pruned['order']}, "
                f"vocab {pruned['v_size']}) -> {args.output}"
            )
            return 0
        if args.op == "merge":
            parts = [p.strip() for p in args.input.split(",") if p.strip()]
            merged = kn_merge([load_kn_lm(spark, p) for p in parts])
            save_kn_lm(merged, args.model)
            kind = (
                f"vocab {merged['v_size']}"
                if "v_size" in merged
                else "count-only"
            )
            print(
                f"merged {len(parts)} LMs (order {merged['order']}, "
                f"{kind}) into {args.model}"
            )
            return 0
        df = spark.read.parquet(args.input)
        if args.op == "train":
            if args.model_type == "count-only":
                from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
                    sb_train,
                )

                model = sb_train(
                    df, text_col=args.text_col, order=args.order
                )
                save_kn_lm(model, args.model)
                n_grams = model["raw"][args.order].count()
                print(
                    f"trained count-only order-{args.order} tables: "
                    f"{n_grams} top-order grams, model={args.model}"
                )
            else:
                model = kn_train(
                    df,
                    text_col=args.text_col,
                    order=args.order,
                    discount=args.discount,
                    min_count=args.min_count,
                )
                save_kn_lm(model, args.model)
                print(
                    f"trained KN order-{args.order} LM: vocab {model['v_size']}, "
                    f"discount {args.discount}, model={args.model}"
                )
        else:  # score
            if not args.output:
                parser.error("lm --op score requires --output")
            model = load_kn_lm(spark, args.model)
            if args.scorer == "stupid-backoff":
                from utc_cuip_kafka_aws_connector_spark.operators.ngramlm import (
                    sb_score,
                )

                scored = sb_score(
                    df, model, text_col=args.text_col, id_col=args.id_col
                )
                if args.buckets:
                    scored = perplexity_buckets(
                        scored, n_buckets=args.buckets,
                        ppl_col="sbs", id_col=args.id_col,
                        method=args.buckets_method,
                    )
            else:
                scored = kn_score(
                    df, model, text_col=args.text_col, id_col=args.id_col
                )
                if args.buckets:
                    scored = perplexity_buckets(
                        scored, n_buckets=args.buckets, id_col=args.id_col,
                        method=args.buckets_method,
                    )
            scored.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            print(
                f"scored {n} docs under {args.model} "
                f"(order {model['order']}), output={args.output}"
            )
    elif args.cmd == "select":
        from utc_cuip_kafka_aws_connector_spark.operators.dsir import (
            dsir_fit,
            dsir_resample,
            dsir_weights,
        )

        target = spark.read.parquet(args.target)
        raw = spark.read.parquet(args.input)
        model = dsir_fit(
            target, raw, text_col=args.text_col, n_buckets=args.n_buckets
        )
        weighted = dsir_weights(
            raw,
            model,
            text_col=args.text_col,
            id_col=args.id_col,
            n_buckets=args.n_buckets,
        )
        if args.weights_only:
            weighted.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            print(f"weighted {n} docs, output={args.output}")
        else:
            if args.k is None:
                parser.error("select requires --k (or --weights-only)")
            sel = dsir_resample(
                weighted, args.k, seed=args.seed, id_col=args.id_col
            )
            sel.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            print(
                f"selected {n}/{raw.count()} docs toward {args.target}, "
                f"output={args.output}"
            )
    elif args.cmd == "wds":
        from utc_cuip_kafka_aws_connector_spark.sources.wds import (
            group_samples,
            read_tar_shards,
            save_tar_shards,
            write_tar_shards,
        )

        if args.op == "import":
            exts = (
                [e.strip() for e in args.extensions.split(",") if e.strip()]
                if args.extensions
                else None
            )
            rows = read_tar_shards(
                spark, args.input, extensions=exts, on_error=args.on_error
            )
            if args.samples:
                rows = group_samples(rows)
            rows.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            shape = "samples" if args.samples else "entries"
            print(f"imported {n} {shape} from {args.input}, output={args.output}")
        else:  # export
            entries = spark.read.parquet(args.input)
            n = save_tar_shards(
                spark, write_tar_shards(entries), args.output
            )
            print(f"exported {n} tar shards to {args.output}")
    elif args.cmd == "pack":
        from pyspark.sql import functions as F

        from utc_cuip_kafka_aws_connector_spark.operators.packout import (
            pack_token_ids,
        )

        packed = pack_token_ids(
            spark.read.parquet(args.input),
            context_len=args.context_len,
            pad_id=args.pad_id,
            eos_id=args.eos_id,
            id_col=args.id_col,
            ids_col=args.ids_col,
            hex_chars=args.shard_hex_chars,
        )
        packed.write.mode("overwrite").parquet(args.output)
        got = spark.read.parquet(args.output)
        stats = got.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tokens").alias("tokens"),
            F.sum(F.col("truncated").cast("int")).alias("truncated"),
        ).collect()[0]
        n_tokens = stats["tokens"] or 0  # sums are null on empty input
        n_trunc = stats["truncated"] or 0
        fill = n_tokens / max(stats["rows"] * args.context_len, 1)
        print(
            f"packed {stats['rows']} rows x {args.context_len} "
            f"({n_tokens} tokens, fill {fill:.3f}, "
            f"{n_trunc} truncated), output={args.output}"
        )
    elif args.cmd == "explain":
        from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

        if args.query not in CATALOG:
            import difflib

            # suggest close names instead of a bare KeyError
            close = difflib.get_close_matches(
                args.query, list(CATALOG), n=3
            )
            parser.error(
                f"unknown query {args.query!r}"
                + (f"; did you mean {close}?" if close else "")
            )
        CATALOG[args.query].builder(spark, args.sf_dir).explain("formatted")
    elif args.cmd == "compact":
        from utc_cuip_kafka_aws_connector_spark.sources.sinks import compact_small_files

        stats = compact_small_files(
            spark,
            args.src,
            args.dest,
            args.partition_cols.split(","),
            target_file_bytes=args.target_file_mb * 1024 * 1024,
        ).collect()
        files = sum(r["files_before"] for r in stats)
        targets = sum(r["files_target"] for r in stats)
        print(
            f"compacted {len(stats)} partitions: {files} files -> ~{targets} "
            f"at {args.target_file_mb} MiB, output={args.dest}"
        )
    elif args.cmd == "stream-curate":
        run_stream_curate(
            spark,
            args.input,
            args.output,
            args.checkpoint,
            schema=args.schema,
            id_col=args.id_col,
            text_col=args.text_col,
            min_quality=args.min_quality,
            c4=args.c4,
            gopher=args.gopher,
            hot_key_col=args.hot_key_col,
            hot_k=args.hot_k,
            drift_ref=args.drift_ref,
            classifier_model=args.classifier_model,
            classifier_min_p=args.classifier_min_p,
            compact_every=args.compact_every,
            near_dup_threshold=args.near_dup_threshold,
            langid_model=args.langid_model,
            lang_col=args.lang_col,
        )
        print(f"stream-curated input={args.input} output={args.output}")
    else:
        run_stream(
            spark, args.topic, args.input, args.output, args.checkpoint, args.format, args.sink
        )
        print(f"streamed topic={args.topic} output={args.output} sink={args.sink}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
