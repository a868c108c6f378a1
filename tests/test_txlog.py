"""Transaction-log sink: atomicity, idempotent replay, snapshot
isolation, time travel, and the version-claim race."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
    commit,
    read_snapshot,
    transactional_batch_writer,
    txn_append,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_append_read_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = txn_append(_df(spark, 0, 100), t)
    v1 = txn_append(_df(spark, 100, 150), t)
    assert (v0, v1) == (0, 1)
    assert read_snapshot(spark, t).count() == 150
    assert read_snapshot(spark, t, version=0).count() == 100  # time travel


def test_txn_replay_is_exactly_once(spark, tmp_path):
    t = str(tmp_path / "tbl")
    a = txn_append(_df(spark, 0, 50), t, txn_id="batch-7")
    b = txn_append(_df(spark, 0, 50), t, txn_id="batch-7")  # replay
    assert a == b == 0
    assert read_snapshot(spark, t).count() == 50


def test_snapshot_isolation_ignores_uncommitted(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 10), t)
    # an in-flight writer: data staged but no manifest committed
    _df(spark, 10, 99).write.parquet(f"{t}/data/inflight")
    assert read_snapshot(spark, t).count() == 10


def test_version_claim_race_retries(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 10), t)
    # another writer claims v1 between our scan and create
    os.makedirs(f"{t}/_log", exist_ok=True)
    with open(f"{t}/_log/v1.json", "w") as fh:
        json.dump({"version": 1, "added": [], "txn_id": "rival"}, fh)
    v = commit(t, [], txn_id="mine")
    assert v == 2  # lost the race at 1, landed at 2
    assert read_snapshot(spark, t).count() == 10


def test_foreach_batch_writer_replay(spark, tmp_path):
    t = str(tmp_path / "tbl")
    wb = transactional_batch_writer(t)
    wb(_df(spark, 0, 30), 0)
    wb(_df(spark, 30, 40), 1)
    wb(_df(spark, 30, 40), 1)  # epoch replay after simulated failure
    assert read_snapshot(spark, t).count() == 40


def test_vacuum_checkpoints_then_prunes(spark, tmp_path):
    """Vacuum: commits a full checkpoint manifest, removes orphaned
    staging (replay duplicates, aborted writes), drops pre-checkpoint
    manifests; the snapshot is unchanged and later appends stack on
    the checkpoint."""
    import os as _os

    from utc_cuip_kafka_aws_connector_spark.sources.txlog import vacuum

    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 60), t, txn_id="a")
    txn_append(_df(spark, 60, 100), t, txn_id="b")
    # replay a committed txn via commit-first path: data write happens,
    # log untouched -> orphan staging dir
    _df(spark, 0, 60).write.parquet(f"{t}/data/orphan")
    # an uncommitted in-flight write younger than the retention window
    _df(spark, 0, 5).write.parquet(f"{t}/data/inflight")

    stats = vacuum(t, min_age_seconds=0.0)
    assert stats["data_dirs_removed"] >= 1  # the orphan (and inflight at age 0)
    assert stats["manifests_removed"] == 2  # v0, v1 folded into checkpoint
    assert read_snapshot(spark, t).count() == 100

    # retention respected: young staging survives a default-age vacuum
    _df(spark, 0, 5).write.parquet(f"{t}/data/inflight2")
    vacuum(t)  # default 24h min age
    assert _os.path.isdir(f"{t}/data/inflight2")

    txn_append(_df(spark, 100, 110), t, txn_id="c")
    assert read_snapshot(spark, t).count() == 110

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=0)  # vacuumed away


def test_snapshot_read_pushes_down_filters(spark, tmp_path):
    """The log hands Spark an explicit parquet file list, so pushdown
    and pruning work exactly as on a plain path scan."""
    import contextlib
    import io

    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 1000), t)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        read_snapshot(spark, t).filter(F.col("id") > 500).select("id").explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,500)]" in plan
    assert "struct<id:bigint>" in plan.split("ReadSchema:")[1].splitlines()[0]  # v pruned


def test_upsert_updates_and_inserts(spark, tmp_path):
    """MERGE semantics: matched keys take the new values, unmatched
    insert; version advances; old snapshot still shows old values."""
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import txn_upsert

    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 100), t)  # v=2*id
    delta = spark.range(90, 120).select(F.col("id"), F.lit(-1).cast("long").alias("v"))
    v = txn_upsert(delta, t, ["id"])
    assert v == 1
    snap = {r["id"]: r["v"] for r in read_snapshot(spark, t).collect()}
    assert len(snap) == 120
    assert snap[50] == 100 and snap[95] == -1 and snap[119] == -1
    old = {r["id"]: r["v"] for r in read_snapshot(spark, t, version=0).collect()}
    assert old[95] == 190 and 119 not in old  # time travel unaffected


def test_upsert_rewrites_only_affected_files(spark, tmp_path):
    """Files without matching keys are carried forward by reference,
    not rewritten: two disjoint appends, upsert touching only the
    second -- the first append's files survive verbatim."""
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import _live_files, txn_upsert

    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 50), t)
    before_first = set(_live_files(t, 0))
    txn_append(_df(spark, 50, 100), t)
    delta = spark.range(60, 70).select(F.col("id"), F.lit(0).cast("long").alias("v"))
    txn_upsert(delta, t, ["id"])
    live = set(_live_files(t, 2))
    assert before_first <= live  # untouched files still referenced
    assert read_snapshot(spark, t).count() == 100


def test_upsert_conflict_detection(spark, tmp_path):
    """An append landing between the upsert's snapshot and commit
    raises ConcurrentWriteError instead of committing a stale rewrite."""
    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.sources import txlog
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        ConcurrentWriteError,
        txn_upsert,
    )

    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 50), t)

    real_commit = txlog.commit
    raced = {"done": False}

    def racing_commit(table_path, added, **kw):
        if not raced["done"] and kw.get("require_latest") is not None:
            raced["done"] = True
            txn_append(_df(spark, 1000, 1010), t)  # rival lands first
        return real_commit(table_path, added, **kw)

    txlog.commit, orig = racing_commit, txlog.commit
    try:
        delta = spark.range(0, 5).select(F.col("id"), F.lit(9).cast("long").alias("v"))
        with _pytest.raises(ConcurrentWriteError):
            txn_upsert(delta, t, ["id"])
    finally:
        txlog.commit = orig
    # retry after re-read succeeds
    assert txn_upsert(delta, t, ["id"]) == 2
    assert read_snapshot(spark, t).count() == 60


def test_upsert_replay_idempotent_and_vacuum_reclaims(spark, tmp_path):
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import txn_upsert, vacuum

    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 40), t, txn_id="base")
    delta = spark.range(0, 40).select(F.col("id"), (F.col("id") + 7).alias("v"))
    a = txn_upsert(delta, t, ["id"], txn_id="fix-7")
    b = txn_upsert(delta, t, ["id"], txn_id="fix-7")
    assert a == b == 1
    snap = {r["id"]: r["v"] for r in read_snapshot(spark, t).collect()}
    assert snap[0] == 7 and len(snap) == 40
    stats = vacuum(t, min_age_seconds=0.0)
    # base's files were fully removed by the upsert: dir or files gone
    assert stats["data_dirs_removed"] + stats["data_files_removed"] >= 1
    assert {r["id"]: r["v"] for r in read_snapshot(spark, t).collect()} == snap


def test_delete_where_and_history(spark, tmp_path):
    """Predicate delete rewrites only matching files; NULL-evaluating
    rows survive; history reports the whole commit trail."""
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        table_history,
        txn_delete,
    )

    t = str(tmp_path / "tbl")
    with_nulls = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 2).alias("v"),
    )
    txn_append(with_nulls, t, txn_id="load")
    v = txn_delete(spark, t, "v > 100", txn_id="trim")
    assert v == 1
    snap = read_snapshot(spark, t)
    # deleted: v>100 (ids 51..99 except %10==0 nulls) = 49 - 4 = 45
    assert snap.count() == 55
    assert snap.filter("v IS NULL").count() == 10  # NULL rows survived
    # no-match delete returns the current version without committing
    assert txn_delete(spark, t, "v > 100000") == 1
    # replay idempotence
    assert txn_delete(spark, t, "v > 100", txn_id="trim") == 1

    hist = table_history(t)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[1]["txn_id"] == "trim" and hist[1]["n_removed"] >= 1


def test_optimize_merges_live_files(spark, tmp_path):
    """Ten tiny append commits collapse to one file; rows and values
    unchanged; replaced files reclaimed by vacuum; time travel to the
    pre-optimize version still works until then."""
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        _live_files,
        txn_optimize,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    for i in range(10):
        txn_append(_df(spark, i * 10, (i + 1) * 10).coalesce(1), t)
    assert len(_live_files(t, 9)) == 10
    v = txn_optimize(spark, t)
    assert v == 10
    assert len(_live_files(t, v)) == 1
    snap = {r["id"]: r["v"] for r in read_snapshot(spark, t).collect()}
    assert len(snap) == 100 and snap[37] == 74
    assert read_snapshot(spark, t, version=9).count() == 100  # pre-optimize
    # idempotent + no-op when already merged
    assert txn_optimize(spark, t) == v
    stats = vacuum(t, min_age_seconds=0.0)
    assert stats["data_dirs_removed"] == 10
    assert {r["id"]: r["v"] for r in read_snapshot(spark, t).collect()} == snap


class _FakeS3Error(Exception):
    def __init__(self, status):
        self.response = {"ResponseMetadata": {"HTTPStatusCode": status}}


class _FakeS3Client:
    """boto3-shaped stand-in implementing S3's conditional-put
    semantics (``If-None-Match: *`` -> HTTP 412 on an existing key)
    over the local filesystem, so the S3 backend's translation layer
    runs for real in tests without the AWS SDK."""

    class exceptions:
        ClientError = _FakeS3Error

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        assert IfNoneMatch == "*", "backend must always claim conditionally"
        path = "/" + Key
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            raise _FakeS3Error(412)
        with os.fdopen(fd, "wb") as fh:
            fh.write(Body)


def test_commit_backend_contract(tmp_path):
    """One contract, every backend: a claim on a fresh path writes the
    payload and returns True; a second claim returns False and leaves
    the original payload intact."""
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        PosixCommitBackend,
        S3ConditionalPutBackend,
    )

    backends = [
        ("posix", PosixCommitBackend()),
        ("s3", S3ConditionalPutBackend("bucket", client=_FakeS3Client())),
    ]
    for name, be in backends:
        p = str(tmp_path / name / "v0.json")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        assert be.try_claim(p, '{"winner": 1}') is True, name
        assert be.try_claim(p, '{"loser": 2}') is False, name
        with open(p) as fh:
            assert fh.read() == '{"winner": 1}', name


def test_s3_backend_requires_client():
    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        S3ConditionalPutBackend,
    )

    with _pytest.raises(ImportError):
        S3ConditionalPutBackend("bucket")


def test_commit_through_s3_backend(spark, tmp_path):
    """The full protocol (versioning, race-loss retry, snapshot reads)
    is backend-independent: run it through the S3-semantics backend."""
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        S3ConditionalPutBackend,
    )

    be = S3ConditionalPutBackend("bucket", client=_FakeS3Client())
    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 10), t)  # v0 via default posix backend
    # rival steals v1, exactly like test_version_claim_race_retries
    with open(f"{t}/_log/v1.json", "w") as fh:
        json.dump({"version": 1, "added": [], "txn_id": "rival"}, fh)
    assert commit(t, [], txn_id="mine", backend=be) == 2
    assert read_snapshot(spark, t).count() == 10


def test_read_snapshot_future_version_raises(spark, tmp_path):
    import pytest as _pytest

    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 10), t)
    with _pytest.raises(ValueError, match="does not exist yet"):
        read_snapshot(spark, t, version=99)


def test_vacuum_concurrent_append_survives(spark, tmp_path):
    """The ADVICE r3 high finding: an append landing between vacuum's
    live-set snapshot and its checkpoint commit must NOT be erased by
    the checkpoint. The fixed vacuum conflict-checks the checkpoint
    (require_latest) and re-snapshots on loss."""
    from utc_cuip_kafka_aws_connector_spark.sources import txlog
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import vacuum

    t = str(tmp_path / "tbl")
    txn_append(_df(spark, 0, 50), t, txn_id="base")

    real_commit = txlog.commit
    raced = {"done": False}

    def racing_commit(table_path, added, **kw):
        if kw.get("full") and not raced["done"]:
            raced["done"] = True
            # rival append lands AFTER vacuum computed its live set
            txn_append(_df(spark, 1000, 1025), t, txn_id="rival")
        return real_commit(table_path, added, **kw)

    txlog.commit = racing_commit
    try:
        stats = vacuum(t, min_age_seconds=0.0)
    finally:
        txlog.commit = real_commit
    assert raced["done"]
    # the rival's 25 rows survived the checkpoint-and-prune
    assert read_snapshot(spark, t).count() == 75
    assert read_snapshot(spark, t, version=stats["checkpoint_version"]).count() == 75


def test_optimize_retries_past_concurrent_append(spark, tmp_path):
    """txn_optimize loses its first commit to a racing append, deletes
    the aborted staging, re-snapshots (now including the rival's file)
    and lands on retry -- no data loss, no orphan staging."""
    from utc_cuip_kafka_aws_connector_spark.sources import txlog
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        _live_files,
        txn_optimize,
    )

    t = str(tmp_path / "tbl")
    for i in range(5):
        txn_append(_df(spark, i * 10, (i + 1) * 10).coalesce(1), t)

    real_commit = txlog.commit
    raced = {"done": False}

    def racing_commit(table_path, added, **kw):
        if kw.get("removed_files") and not raced["done"]:
            raced["done"] = True
            txn_append(_df(spark, 500, 510).coalesce(1), t, txn_id="rival")
        return real_commit(table_path, added, **kw)

    txlog.commit = racing_commit
    try:
        v = txn_optimize(spark, t)
    finally:
        txlog.commit = real_commit
    assert raced["done"]
    live = _live_files(t, v)
    assert len(live) == 1  # retry folded the rival's file in too
    assert read_snapshot(spark, t).count() == 60
    # aborted attempt's staging was cleaned up: every data dir is live
    live_dirs = {os.path.basename(os.path.dirname(f)) for f in live}
    on_disk = set(os.listdir(f"{t}/data"))
    orphan_ok = {  # pre-optimize dirs awaiting vacuum are expected
        os.path.basename(os.path.dirname(f))
        for fv in range(v)
        for f in (_live_files(t, fv) or [])
    }
    assert on_disk <= live_dirs | orphan_ok


def test_optimize_raises_after_retry_budget(spark, tmp_path):
    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.sources import txlog
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        ConcurrentWriteError,
        txn_optimize,
    )

    t = str(tmp_path / "tbl")
    for i in range(4):
        txn_append(_df(spark, i * 10, (i + 1) * 10).coalesce(1), t)

    real_commit = txlog.commit
    rival = {"n": 100}

    def always_racing_commit(table_path, added, **kw):
        if kw.get("removed_files"):
            rival["n"] += 1
            txn_append(_df(spark, rival["n"] * 10, rival["n"] * 10 + 5).coalesce(1), t)
        return real_commit(table_path, added, **kw)

    txlog.commit = always_racing_commit
    try:
        with _pytest.raises(ConcurrentWriteError):
            txn_optimize(spark, t, max_retries=2)
    finally:
        txlog.commit = real_commit
    # every row, including all rivals', still readable
    assert read_snapshot(spark, t).count() == 40 + 2 * 5


def test_model_based_random_ops(spark, tmp_path):
    """Model check: a seeded random interleaving of append / upsert /
    delete / optimize / vacuum must keep the table identical to a
    plain dict model after every step."""
    import random

    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        txn_delete,
        txn_optimize,
        txn_upsert,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    rng = random.Random(42)
    model: dict[int, int] = {}
    next_id = 0

    def mk(rows):
        return spark.createDataFrame(rows, "id long, v long")

    txn_append(mk([(i, i) for i in range(20)]), t)
    model.update({i: i for i in range(20)})
    next_id = 20

    for step in range(12):
        op = rng.choice(["append", "upsert", "delete", "optimize", "vacuum"])
        if op == "append":
            n = rng.randint(1, 15)
            rows = [(next_id + j, rng.randint(0, 99)) for j in range(n)]
            txn_append(mk(rows), t)
            model.update(dict(rows))
            next_id += n
        elif op == "upsert":
            ids = rng.sample(sorted(model), min(len(model), rng.randint(1, 8)))
            rows = [(i, rng.randint(100, 199)) for i in ids]
            rows += [(next_id, 7)]
            txn_upsert(mk(rows), t, ["id"])
            model.update(dict(rows))
            next_id += 1
        elif op == "delete":
            cut = rng.randint(0, 199)
            txn_delete(spark, t, f"v < {cut}")
            model = {k: v for k, v in model.items() if not (v < cut)}
        elif op == "optimize":
            txn_optimize(spark, t, target_file_bytes=1 << 30)
        else:
            vacuum(t, min_age_seconds=0.0)
        if not model:
            break
        got = {r["id"]: r["v"] for r in read_snapshot(spark, t).collect()}
        assert got == model, f"divergence after step {step} ({op})"


# ---------------------------------------------------------------------------
# Data skipping (manifest footer-stats) + change feed
# ---------------------------------------------------------------------------


def _ranged_df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("s"),
    )


def test_stats_collected_on_append(spark, tmp_path):
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import _file_stats

    t = str(tmp_path / "tbl")
    txn_append(_ranged_df(spark, 0, 100).coalesce(1), t)
    stats = _file_stats(t, 0)
    assert len(stats) == 1
    (s,) = stats.values()
    assert s["rows"] == 100
    assert s["cols"]["id"] == {"min": 0, "max": 99, "nulls": 0}
    assert s["cols"]["v"] == {"min": 0, "max": 198, "nulls": 0}
    assert s["cols"]["s"]["min"] == "k000000"


def test_predicated_read_prunes_files(spark, tmp_path):
    """Ten non-overlapping appends; a range predicate must open only
    the files whose [min,max] intersect it -- proven via the pruner --
    and return exactly the filtered rows."""
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        _live_files,
        prune_files,
    )

    t = str(tmp_path / "tbl")
    for i in range(10):
        txn_append(_ranged_df(spark, i * 100, (i + 1) * 100).coalesce(1), t)
    live = _live_files(t, 9)
    assert len(live) == 10
    kept = prune_files(t, 9, live, [("id", ">=", 250), ("id", "<", 450)])
    assert len(kept) == 3  # files [200,300) [300,400) [400,500)
    got = read_snapshot(spark, t, where=[("id", ">=", 250), ("id", "<", 450)])
    assert got.count() == 200
    assert got.agg(F.min("id"), F.max("id")).collect()[0][0:2] == (250, 449)
    # string stats prune too
    kept_s = prune_files(t, 9, live, [("s", "=", "k000723")])
    assert len(kept_s) == 1
    assert read_snapshot(spark, t, where=[("s", "=", "k000723")]).count() == 1


def test_predicated_read_empty_and_unknown_cols(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(3):
        txn_append(_ranged_df(spark, i * 10, (i + 1) * 10).coalesce(1), t)
    # out-of-range predicate: every file pruned, empty result, schema kept
    got = read_snapshot(spark, t, where=[("id", ">", 10_000)])
    assert got.count() == 0
    assert set(got.columns) == {"id", "v", "s"}


def test_stats_survive_vacuum_checkpoint(spark, tmp_path):
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        _live_files,
        prune_files,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    for i in range(5):
        txn_append(_ranged_df(spark, i * 100, (i + 1) * 100).coalesce(1), t)
    vacuum(t, min_age_seconds=0.0)
    latest = max(
        int(f[1:-5]) for f in os.listdir(f"{t}/_log") if f.endswith(".json")
    )
    live = _live_files(t, latest)
    kept = prune_files(t, latest, live, [("id", "<", 100)])
    assert len(kept) == 1, "checkpoint dropped the carried-forward stats"


def test_change_feed_roundtrip(spark, tmp_path):
    """insert/delete feed across append + delete + optimize: layout
    commits are invisible, net changes reconstruct the snapshot."""
    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        read_changes,
        txn_delete,
        txn_optimize,
    )

    t = str(tmp_path / "tbl")
    txn_append(_ranged_df(spark, 0, 100).coalesce(1), t)       # v0
    txn_append(_ranged_df(spark, 100, 200).coalesce(1), t)     # v1
    txn_delete(spark, t, "id >= 150")                          # v2 (CoW rewrite)
    v_opt = txn_optimize(spark, t, target_file_bytes=1 << 30)  # layout only

    feed = read_changes(spark, t, 0).toPandas()
    assert set(feed["_change_type"]) == {"insert", "delete"}
    assert v_opt not in set(feed["_commit_version"]), "optimize leaked into the feed"
    # net replay: inserts minus deletes per id == live snapshot
    ins = feed[feed._change_type == "insert"].groupby("id").size()
    dels = feed[feed._change_type == "delete"].groupby("id").size()
    net = ins.sub(dels, fill_value=0)
    live_ids = set(net[net > 0].index)
    snap_ids = {r["id"] for r in read_snapshot(spark, t).collect()}
    assert live_ids == snap_ids == set(range(150))
    # incremental consumption: only v2's net effect is the deletion
    tail = read_changes(spark, t, 2, 2).toPandas()
    t_ins = set(tail[tail._change_type == "insert"]["id"])
    t_del = set(tail[tail._change_type == "delete"]["id"])
    assert t_del - t_ins == set(range(150, 200))


def test_change_feed_bounds_validation(spark, tmp_path):
    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.sources.txlog import read_changes, vacuum

    t = str(tmp_path / "tbl")
    txn_append(_ranged_df(spark, 0, 10).coalesce(1), t)
    with _pytest.raises(ValueError, match="does not exist yet"):
        read_changes(spark, t, 0, 5)
    txn_append(_ranged_df(spark, 10, 20).coalesce(1), t)
    vacuum(t, min_age_seconds=0.0)  # prunes manifests v0/v1
    with _pytest.raises(ValueError, match="predates retained history"):
        read_changes(spark, t, 0)


def test_optimize_zorder_multi_column_skipping(spark, tmp_path):
    """OPTIMIZE ZORDER BY (x, y): after clustering, a selective
    predicate on EITHER column alone prunes most files via manifest
    stats -- before, random appends leave every file covering the full
    range of both, so nothing prunes. Rows are bit-identical."""
    from pyspark.sql import functions as SF

    from utc_cuip_kafka_aws_connector_spark.sources.txlog import (
        _live_files,
        prune_files,
        txn_optimize,
    )

    t = str(tmp_path / "tbl")
    # 8 appends, each spanning the FULL range of x and y (id-striped),
    # so pre-zorder stats cannot prune anything.
    for i in range(8):
        df = (
            spark.range(i, 4096, 8)
            .select(
                SF.col("id"),
                (SF.col("id") % 64).alias("x"),
                SF.floor(SF.col("id") / 64).alias("y"),
            )
            .coalesce(1)
        )
        txn_append(df, t)
    live0 = _live_files(t, 7)
    assert len(live0) == 8
    sel = [("x", ">=", 10), ("x", "<", 14)]  # 1/16 of the x domain
    assert len(prune_files(t, 7, live0, sel)) == 8, "striped layout shouldn't prune"

    # small target -> ~16 clustered files, enough z-cells that a
    # narrow one-column slice maps to a minority of files
    v = txn_optimize(spark, t, target_file_bytes=1_800, zorder_by=["x", "y"])
    live1 = _live_files(t, v)
    assert len(live1) >= 10, "want a multi-file layout to prove pruning"
    kept_x = prune_files(t, v, live1, sel)
    kept_y = prune_files(t, v, live1, [("y", ">=", 10), ("y", "<", 14)])
    assert len(kept_x) <= len(live1) // 2, f"x-pruning weak: {len(kept_x)}/{len(live1)}"
    assert len(kept_y) <= len(live1) // 2, f"y-pruning weak: {len(kept_y)}/{len(live1)}"
    # clustering never changes content
    before = {(r["id"], r["x"], r["y"]) for r in read_snapshot(spark, t, version=7).collect()}
    after = {(r["id"], r["x"], r["y"]) for r in read_snapshot(spark, t, version=v).collect()}
    assert before == after
    # and the predicated read returns exactly the filtered rows
    got = read_snapshot(spark, t, where=sel)
    assert got.count() == 4 * 64  # 4 x-values * 64 y rows each


def test_zorder_rejects_string_columns(spark, tmp_path):
    import pytest as _pytest

    from utc_cuip_kafka_aws_connector_spark.sources.txlog import txn_optimize

    t = str(tmp_path / "tbl")
    txn_append(_ranged_df(spark, 0, 10).coalesce(1), t)
    txn_append(_ranged_df(spark, 10, 20).coalesce(1), t)
    with _pytest.raises(ValueError, match="zorder_by supports"):
        txn_optimize(spark, t, zorder_by=["s"])
