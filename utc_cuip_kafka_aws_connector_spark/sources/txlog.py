"""Minimal transaction-log table format: atomic append + snapshot
reads over plain parquet, no extra jars.

The reference's CSV read-modify-write append (df_manager.py:86-92) is
not atomic and loses data under concurrent flushes; SURVEY §2.B's
north-star row asks for a Delta-style transactional sink. Delta jars
are not in this image, so this module implements the load-bearing
subset of that design directly (the same log-structured idea as
Delta/Iceberg, re-derived over the public commit-protocol concepts):

- Data files are written ONCE, to unique staging directories -- never
  renamed, never appended to, never overwritten.
- A commit is one atomically-created manifest ``_log/v{N}.json``
  listing the files the transaction adds. Readers see a version or
  they don't: no torn state, ever.
- Version numbers are claimed through a pluggable ``CommitBackend``
  whose one primitive is create-if-absent: a losing writer's claim
  returns False and it retries at N+1 -- optimistic concurrency, last
  committer wins the next slot. ``PosixCommitBackend`` (the default)
  claims with O_EXCL file creation (atomic on POSIX / HDFS);
  ``S3ConditionalPutBackend`` documents the same contract over S3's
  conditional PUT (``If-None-Match: *``) -- the protocol above is
  byte-identical either way, only the claim primitive changes.
- Each commit carries an optional ``txn_id``. Committing a txn_id
  that is already in the log is a no-op returning the existing
  version: foreachBatch replay after a crash cannot double-append
  (exactly-once, the property the epoch-keyed writer approximates
  with overwrite directories).
- Manifests carry ``added`` and ``removed`` file lists; a reader
  replays them in version order (``live = live - removed + added``)
  from the newest checkpoint manifest: snapshot isolation for free,
  and older N = time travel. ``removed`` is what makes row-level
  MERGE/upsert expressible as file-level copy-on-write (txn_upsert).

100 TB notes: manifests hold file PATHS, not data -- commit cost is
O(files added), independent of table size. Reads list one small log
directory instead of the data prefix (no S3 listing storm) and hand
Spark an explicit file list, so partition pruning and predicate
pushdown work unchanged on the parquet files themselves. Manifests
additionally carry per-file footer statistics (min/max/null-count),
so a predicated read (``read_snapshot(..., where=...)``) prunes
files BEFORE any data request -- Delta/Iceberg-style data skipping --
and ``read_changes`` exposes each commit's added/removed rows as a
change feed for incremental downstream pipelines.
"""

from __future__ import annotations

import datetime
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_log"


class ConcurrentWriteError(RuntimeError):
    """Another transaction committed between this writer's snapshot
    read and its commit attempt, and the operation (upsert) cannot
    blindly win the next version slot: re-read and retry."""


class CommitBackend:
    """The one storage primitive the commit protocol needs: atomic
    create-if-absent of a manifest at a given path. Everything else
    (version numbering, idempotence, conflict detection, checkpoint
    replay) is backend-independent logic in :func:`commit`.

    Contract (exercised for every registered backend by
    tests/test_txlog.py::test_commit_backend_contract):

    - ``try_claim(path, payload)`` durably creates ``path`` with
      exactly ``payload`` and returns True, **iff** no object existed
      at ``path``; otherwise returns False and writes nothing.
    - Two racing claims on the same path: exactly one True.
    - A False claim never corrupts the existing object.
    """

    def try_claim(self, path: str, payload: str) -> bool:
        raise NotImplementedError


class PosixCommitBackend(CommitBackend):
    """Claim via ``O_EXCL`` exclusive creation -- atomic on POSIX
    filesystems and HDFS (and NFSv3+ with proper locking)."""

    def try_claim(self, path: str, payload: str) -> bool:
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        return True


class S3ConditionalPutBackend(CommitBackend):
    """Claim via S3 conditional write: ``PUT`` with
    ``If-None-Match: *`` fails with HTTP 412 when the key already
    exists (public S3 API, also supported by GCS ``x-goog-if-
    generation-match: 0`` and Azure ``If-None-Match: *``). Maps 200 ->
    True, 412 -> False; any other error propagates. This is the exact
    same linearizable create-if-absent primitive as O_EXCL, so every
    guarantee above carries over to object storage unchanged.

    The AWS SDK is not in this image, so the constructor takes the
    client injected (``boto3.client("s3")``-shaped); instantiating it
    without one raises ImportError rather than silently degrading.
    """

    def __init__(self, bucket: str, client=None):
        if client is None:
            raise ImportError(
                "S3ConditionalPutBackend needs an injected S3 client "
                "(boto3 is not bundled); pass client=boto3.client('s3')"
            )
        self.bucket = bucket
        self.client = client

    def try_claim(self, path: str, payload: str) -> bool:
        try:
            self.client.put_object(
                Bucket=self.bucket,
                Key=path.lstrip("/"),
                Body=payload.encode(),
                IfNoneMatch="*",
            )
            return True
        except self.client.exceptions.ClientError as e:
            if e.response["ResponseMetadata"]["HTTPStatusCode"] == 412:
                return False
            raise


_DEFAULT_BACKEND = PosixCommitBackend()


# ---------------------------------------------------------------------------
# Per-file column statistics (min/max/null-count from the parquet
# footers, stored in the manifest) -- the data-skipping layer. At
# 100 TB the wins stack: a filtered read prunes files from the
# MANIFEST, before any object-store request, so a selective predicate
# over a clustered column touches a handful of files out of millions
# (the same design as Delta/Iceberg stats-based skipping).
# ---------------------------------------------------------------------------

_STATS_MAX_COLS = 32  # first N leaf columns, Delta-style dataSkippingNumIndexedCols


def _encode_stat(v):
    """JSON-encode a parquet footer min/max. Temporal values carry a
    type tag; everything else is a native JSON scalar."""
    if isinstance(v, datetime.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "date", "v": v.isoformat()}
    if isinstance(v, bytes):
        return None  # binary min/max: not useful for pruning
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


def _decode_stat(v):
    if isinstance(v, dict):
        if v.get("t") == "ts":
            return datetime.datetime.fromisoformat(v["v"])
        if v.get("t") == "date":
            return datetime.date.fromisoformat(v["v"])
    return v


def collect_file_stats(files: list[str]) -> dict[str, dict]:
    """Aggregate row-group footer statistics per file: row count and,
    for the first _STATS_MAX_COLS primitive leaf columns, min / max /
    null_count. Footer-only reads -- O(files) metadata requests, no
    data scanned."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols: dict[str, dict] = {}
        poisoned: set[str] = set()  # any row group lacking stats disables the column
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for ci in range(min(group.num_columns, _STATS_MAX_COLS)):
                col = group.column(ci)
                name = col.path_in_schema
                if "." in name or name in poisoned:  # nested leaf / disabled
                    continue
                st = col.statistics
                mn = mx = None
                if st is not None and st.has_min_max:
                    mn, mx = _encode_stat(st.min), _encode_stat(st.max)
                if mn is None or mx is None or (rg > 0 and name not in cols):
                    poisoned.add(name)
                    cols.pop(name, None)
                    continue
                nulls = st.null_count if st.has_null_count else None
                cur = cols.get(name)
                if cur is None:
                    cols[name] = {"min": mn, "max": mx, "nulls": nulls}
                else:
                    cur["min"] = min(cur["min"], mn, key=_decode_stat)
                    cur["max"] = max(cur["max"], mx, key=_decode_stat)
                    cur["nulls"] = (
                        None
                        if (cur["nulls"] is None or nulls is None)
                        else cur["nulls"] + nulls
                    )
        out[f] = {"rows": md.num_rows, "cols": cols}
    return out


def _file_stats(table_path: str, version: int) -> dict[str, dict]:
    """Stats for every live-or-once-added file, replayed from the same
    manifest range a reader of ``version`` uses."""
    versions = [v for v in _versions(table_path) if v <= version]
    manifests = [_read_manifest(table_path, v) for v in versions]
    start = 0
    for i, m in enumerate(manifests):
        if m.get("full"):
            start = i
    stats: dict[str, dict] = {}
    for m in manifests[start:]:
        stats.update(m.get("stats") or {})
    return stats


_SKIP_OPS = {"<", "<=", ">", ">=", "=", "=="}


def _file_may_match(stats: dict | None, where: list[tuple]) -> bool:
    """False only when the footer stats PROVE no row in the file can
    satisfy the conjunction -- unknown stats always keep the file."""
    if not stats:
        return True
    for col, op, val in where:
        cs = (stats.get("cols") or {}).get(col)
        if cs is None:
            continue
        if cs.get("nulls") is not None and cs["nulls"] == stats.get("rows"):
            return False  # all-null column: no comparison can hold
        mn, mx = _decode_stat(cs["min"]), _decode_stat(cs["max"])
        if isinstance(val, str) and isinstance(mn, (datetime.date, datetime.datetime)):
            val = type(mn).fromisoformat(val)
        try:
            if op in ("=", "==") and (val < mn or val > mx):
                return False
            if op == "<" and mn >= val:
                return False
            if op == "<=" and mn > val:
                return False
            if op == ">" and mx <= val:
                return False
            if op == ">=" and mx < val:
                return False
        except TypeError:
            continue  # incomparable literal/stat types: keep the file
    return True


def prune_files(
    table_path: str, version: int, files: list[str], where: list[tuple]
) -> list[str]:
    """The file list a reader with predicate ``where`` (a list of
    ``(col, op, literal)`` conjuncts, op in <,<=,>,>=,=) actually needs:
    manifest-stats pruning, zero data I/O."""
    bad = [c for c in where if c[1] not in _SKIP_OPS]
    if bad:
        raise ValueError(f"unsupported skip predicate ops: {bad}")
    stats = _file_stats(table_path, version)
    return [f for f in files if _file_may_match(stats.get(f), where)]


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, _LOG_DIR)


def _versions(table_path: str) -> list[int]:
    log = _log_path(table_path)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(table_path: str, version: int) -> dict:
    with open(os.path.join(_log_path(table_path), f"v{version}.json")) as fh:
        return json.load(fh)


def commit(
    table_path: str,
    added_files: list[str],
    txn_id: str | None = None,
    full: bool = False,
    removed_files: list[str] | None = None,
    require_latest: int | None = None,
    backend: CommitBackend | None = None,
    stats: dict[str, dict] | None = None,
    data_change: bool = True,
) -> int:
    """Atomically commit ``added_files`` (and optionally
    ``removed_files``) as the next table version. Returns the
    committed version. Idempotent on ``txn_id``: if a manifest
    already records it, that version is returned and nothing is
    written (streaming replay safety). ``full=True`` marks the
    manifest as a CHECKPOINT: it lists the complete live file set, so
    readers start there instead of replaying from v0 (and vacuum may
    drop everything older). ``require_latest`` enables optimistic
    conflict detection for read-modify-write transactions: the commit
    only lands if the table's latest version still equals it
    (otherwise ConcurrentWriteError -- the caller's snapshot is
    stale; blind appends never need this). ``backend`` selects the
    atomic-claim primitive (default: POSIX O_EXCL). ``stats`` maps
    added file -> footer statistics for data skipping. ``data_change``
    False marks a layout-only commit (OPTIMIZE, checkpoint): readers
    see identical rows before and after, and the change feed skips
    it."""
    backend = backend or _DEFAULT_BACKEND
    os.makedirs(_log_path(table_path), exist_ok=True)
    while True:
        versions = _versions(table_path)
        if txn_id is not None:
            for v in versions:
                if _read_manifest(table_path, v).get("txn_id") == txn_id:
                    return v
        latest = versions[-1] if versions else None
        if require_latest is not None and latest != require_latest:
            raise ConcurrentWriteError(
                f"table advanced to v{latest} past the transaction's "
                f"snapshot v{require_latest}; re-read and retry"
            )
        next_v = (latest + 1) if versions else 0
        manifest = {
            "version": next_v,
            "added": sorted(added_files),
            "removed": sorted(removed_files or []),
            "txn_id": txn_id,
            "full": full,
            "data_change": data_change,
            "stats": stats or {},
            "committed_at_ms": int(time.time() * 1000),
        }
        target = os.path.join(_log_path(table_path), f"v{next_v}.json")
        # Exactly one writer's claim on this version slot succeeds.
        if backend.try_claim(target, json.dumps(manifest)):
            return next_v
        continue  # lost the race -- re-scan (maybe our txn_id won) and retry


def txn_append(
    df: DataFrame, table_path: str, txn_id: str | None = None
) -> int:
    """Transactional append: write ``df`` as parquet into a unique
    staging directory, then commit the produced files. Readers never
    see the staging write until the manifest lands. Returns the
    committed version.

    Replay safety: when ``txn_id`` is already committed the data
    write still happens (to a fresh orphan staging dir -- harmless,
    vacuumable) but the LOG is untouched, so readers never see
    duplicates. Check-before-write is deliberately not relied on for
    correctness, only as a fast path."""
    versions = _versions(table_path)
    if txn_id is not None:
        for v in versions:
            if _read_manifest(table_path, v).get("txn_id") == txn_id:
                return v  # fast path: skip the data write entirely
    staging = os.path.join(table_path, "data", uuid.uuid4().hex)
    df.write.parquet(staging)
    files = [
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    ]
    return commit(table_path, files, txn_id=txn_id, stats=collect_file_stats(files))


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    where: list[tuple] | None = None,
) -> DataFrame:
    """Read the table at ``version`` (default: latest). The file list
    comes from the log, so concurrent in-flight writes are invisible
    (snapshot isolation) and an older version is time travel.

    ``where`` -- an optional conjunction of ``(col, op, literal)``
    with op in <,<=,>,>=,= -- applies the predicate AND prunes files
    whose manifest footer-stats prove they hold no matching row, so a
    selective read opens a fraction of the live files (data skipping;
    the predicate is also still pushed to the parquet scan for
    row-group pruning within the files that remain)."""
    versions = _versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_path}")
    if version is None:
        version = versions[-1]
    elif version > versions[-1]:
        # A typo'd/stale time-travel version must fail loudly, not
        # quietly resolve to the latest snapshot (wrong-but-plausible
        # data is worse than an error).
        raise ValueError(
            f"version {version} does not exist yet (latest committed "
            f"version of {table_path} is v{versions[-1]})"
        )
    files = _live_files(table_path, version)
    if files is None:
        raise FileNotFoundError(
            f"version {version} predates the oldest retained manifest "
            f"(v{versions[0]}) -- vacuumed away"
        )
    if not files:
        # A table whose every row was deleted has no live files and
        # parquet needs at least one path; surface that state clearly.
        raise FileNotFoundError(
            f"version {version} of {table_path} is empty (all files "
            "removed); no schema is recoverable from zero parquet files"
        )
    if where:
        from pyspark.sql import functions as F

        kept = prune_files(table_path, version, files, where)
        pred = None
        for col, op, val in where:
            c = F.col(col)
            term = {
                "<": c < val, "<=": c <= val, ">": c > val,
                ">=": c >= val, "=": c == val, "==": c == val,
            }[op]
            pred = term if pred is None else (pred & term)
        if not kept:
            # every file pruned: empty result with the right schema
            return spark.read.parquet(*files).filter(F.lit(False))
        return spark.read.parquet(*kept).filter(pred)
    return spark.read.parquet(*files)


def _live_files(table_path: str, version: int) -> list[str] | None:
    """The live file set at ``version``: replay manifests in order
    from the newest checkpoint <= version, applying removed before
    added. None when the version predates retained history."""
    versions = _versions(table_path)
    in_range = [v for v in versions if v <= version]
    if not in_range:
        return None
    manifests = [_read_manifest(table_path, v) for v in in_range]
    start = 0
    for i, m in enumerate(manifests):
        if m.get("full"):
            start = i
    live: list[str] = []
    for m in manifests[start:]:
        removed = set(m.get("removed", []))
        if removed:
            live = [f for f in live if f not in removed]
        live.extend(m["added"])
    return live


def vacuum(
    table_path: str, min_age_seconds: float = 24 * 3600.0
) -> dict[str, int]:
    """Garbage-collect the table, Delta-VACUUM style, in two steps:

    1. Commit a CHECKPOINT manifest (``full=True``) listing the
       complete live file set as of the current latest version --
       manifests are cumulative, so older ones can only be dropped
       once a full manifest carries their state forward.
    2. Delete manifests older than that checkpoint (time travel below
       it is deliberately given up) and staging directories no
       retained manifest references -- aborted writes and
       replay-orphaned data.

    ``min_age_seconds`` protects in-flight writers: a staging dir
    younger than this is never touched even if unreferenced, because
    its commit may simply not have landed yet (the same retention
    safety rule as Delta's VACUUM). Returns counts for observability.
    """
    import shutil

    versions = _versions(table_path)
    if not versions:
        return {
            "data_dirs_removed": 0,
            "data_files_removed": 0,
            "manifests_removed": 0,
            "checkpoint_version": -1,
        }
    # The checkpoint must capture the live set AS OF the version slot
    # it lands in: committing it without require_latest would let a
    # concurrent append slip in between our _live_files() snapshot and
    # the claim, after which the checkpoint -- which readers replay
    # FROM -- would silently omit that append's files and step 2 below
    # would delete its manifest: permanent data loss. So the claim is
    # conflict-checked like every read-modify-write, and on
    # ConcurrentWriteError we recompute latest+live and retry.
    while True:
        latest = _versions(table_path)[-1]
        # Live file set = what a reader of `latest` sees.
        live = _live_files(table_path, latest) or []
        try:
            # Carry each live file's footer stats forward: manifests
            # older than the checkpoint are pruned below, and stats
            # must survive for data skipping to keep working.
            carried = {
                f: s for f, s in _file_stats(table_path, latest).items() if f in set(live)
            }
            ckpt = commit(
                table_path,
                sorted(set(live)),
                txn_id=f"vacuum-of-v{latest}",
                full=True,
                require_latest=latest,
                stats=carried,
                data_change=False,  # checkpoint: no row changes
            )
            break
        except ConcurrentWriteError:
            continue  # a writer advanced the table; re-snapshot

    keep_dirs = {os.path.dirname(f) for f in live}
    removed_dirs = 0
    data_root = os.path.join(table_path, "data")
    now = time.time()
    if os.path.isdir(data_root):
        for name in os.listdir(data_root):
            d = os.path.join(data_root, name)
            if d in keep_dirs:
                continue
            if now - os.path.getmtime(d) < min_age_seconds:
                continue  # possibly an in-flight writer's staging
            shutil.rmtree(d, ignore_errors=True)
            removed_dirs += 1

    removed_manifests = 0
    for v in _versions(table_path):
        if v < ckpt:
            os.remove(os.path.join(_log_path(table_path), f"v{v}.json"))
            removed_manifests += 1

    # Dead files inside kept dirs: an upsert removes individual files
    # whose staging dir still holds live siblings. Once the manifests
    # that referenced them are pruned above, nothing can time-travel
    # to them -- unlink. (A committed dir contains only files its
    # manifest listed, so non-live parquet there is always dead.)
    removed_files = 0
    live_set = set(live)
    for d in keep_dirs:
        if os.path.isdir(d):
            for name in os.listdir(d):
                f = os.path.join(d, name)
                if name.endswith(".parquet") and f not in live_set:
                    os.remove(f)
                    removed_files += 1
    return {
        "data_dirs_removed": removed_dirs,
        "data_files_removed": removed_files,
        "manifests_removed": removed_manifests,
        "checkpoint_version": ckpt,
    }


def txn_upsert(
    df: DataFrame,
    table_path: str,
    key_cols: list[str],
    txn_id: str | None = None,
) -> int:
    """MERGE/upsert: rows in ``df`` replace table rows with the same
    key; unmatched rows are inserted. File-level copy-on-write, the
    standard log-structured design:

    1. Snapshot the table at its latest version.
    2. Find the files that CONTAIN a matching key (semi-join of
       ``input_file_name()`` against the incoming keys -- file paths
       are metadata-scale, so collecting them is O(affected files),
       never O(rows)). Untouched files are not rewritten or read
       again: at 100 TB an upsert touching 0.1% of keys rewrites
       ~0.1% of well-clustered files.
    3. Rewrite affected files minus matched rows, union the incoming
       rows, stage, and commit {added, removed} with
       ``require_latest`` = the snapshot version: any concurrent
       commit in between raises ConcurrentWriteError instead of
       silently basing the rewrite on stale files (first committer
       wins; the loser re-reads and retries). Blind appends racing an
       upsert are NOT aborted -- they win the slot and the upsert
       retries -- matching Delta's serializability rules.

    Idempotent on ``txn_id`` like every commit. Requires ``df``'s
    schema to cover the table's columns (selected by name).
    """
    versions = _versions(table_path)
    if txn_id is not None:
        for v in versions:
            if _read_manifest(table_path, v).get("txn_id") == txn_id:
                return v
    if not versions:
        return txn_append(df, table_path, txn_id=txn_id)
    base_version = versions[-1]
    live = _live_files(table_path, base_version) or []

    spark = df.sparkSession
    from pyspark.sql import functions as F

    current = spark.read.parquet(*live)
    df = df.select(*current.columns)
    keys = df.select(*key_cols).dropDuplicates()
    # Affected files: normalize input_file_name's URI form back to the
    # plain paths the manifests store. Join strategy is left to
    # Catalyst/AQE: a small upsert delta broadcasts, a huge backfill
    # shuffles -- both correct.
    affected = [
        r["__file"]
        for r in current.withColumn(
            "__file",
            F.regexp_replace(F.input_file_name(), "^[a-z0-9]+:/+", "/"),
        )
        .join(keys, key_cols, "left_semi")
        .select("__file")
        .distinct()
        .collect()
    ]

    if affected:
        survivors = spark.read.parquet(*affected).join(keys, key_cols, "left_anti")
        new_data = survivors.select(*current.columns).unionByName(df)
    else:
        new_data = df
    staging = os.path.join(table_path, "data", uuid.uuid4().hex)
    new_data.write.parquet(staging)
    files = [
        os.path.join(staging, f) for f in os.listdir(staging) if f.endswith(".parquet")
    ]
    return commit(
        table_path,
        files,
        txn_id=txn_id,
        removed_files=affected,
        require_latest=base_version,
        stats=collect_file_stats(files),
    )


def txn_delete(
    spark: SparkSession,
    table_path: str,
    predicate: str,
    txn_id: str | None = None,
) -> int:
    """DELETE WHERE ``predicate``: same file-level copy-on-write as
    txn_upsert -- files containing a matching row are rewritten
    without those rows; untouched files carry forward by reference.
    Conflict-checked against the snapshot version."""
    from pyspark.sql import functions as F

    versions = _versions(table_path)
    if txn_id is not None:
        for v in versions:
            if _read_manifest(table_path, v).get("txn_id") == txn_id:
                return v
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_path}")
    base_version = versions[-1]
    live = _live_files(table_path, base_version) or []
    current = spark.read.parquet(*live)
    affected = [
        r["__file"]
        for r in current.filter(predicate)
        .withColumn(
            "__file", F.regexp_replace(F.input_file_name(), "^[a-z0-9]+:/+", "/")
        )
        .select("__file")
        .distinct()
        .collect()
    ]
    if not affected:
        return base_version  # nothing matched: no new version needed
    # Keep rows where the predicate is not TRUE -- a bare NOT(pred)
    # would also drop rows where pred evaluates to NULL.
    survivors = spark.read.parquet(*affected).filter(
        ~F.coalesce(F.expr(predicate), F.lit(False))
    )
    staging = os.path.join(table_path, "data", uuid.uuid4().hex)
    survivors.write.parquet(staging)
    files = [
        os.path.join(staging, f) for f in os.listdir(staging) if f.endswith(".parquet")
    ]
    return commit(
        table_path,
        files,
        txn_id=txn_id,
        removed_files=affected,
        require_latest=base_version,
        stats=collect_file_stats(files),
    )


def _zorder_column(df: DataFrame, cols: list[str], bits: int = 6):
    """Z-value (Morton code) expression: each column rank-maps to a
    ``2**bits``-bucket id via its approx-quantile boundaries, and the
    bucket bits interleave across columns, so sorting by the z-value
    clusters ALL the columns at once. Whole computation is one
    aggregate pass (percentile_approx, partial-aggregatable) plus a
    per-row JVM expression over a tiny literal boundary array --
    nothing here is driver- or single-task-bound at any scale."""
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    numeric_exprs = {}
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt in ("date",):
            numeric_exprs[c] = F.unix_date(F.col(c)).cast("double")
        elif dt.startswith("timestamp"):
            numeric_exprs[c] = F.unix_micros(F.col(c)).cast("double")
        elif dt in ("tinyint", "smallint", "int", "bigint", "float", "double") or dt.startswith(
            "decimal"
        ):
            numeric_exprs[c] = F.col(c).cast("double")
        else:
            raise ValueError(f"zorder_by supports numeric/date/timestamp columns; {c} is {dt}")
    qs = [i / (n_buckets - 1) for i in range(n_buckets)]
    row = df.select(
        *[
            F.percentile_approx(numeric_exprs[c], qs, 10_000).alias(c)
            for c in cols
        ]
    ).collect()[0]
    z = F.lit(0).cast("long")
    for pos, c in enumerate(cols):
        boundaries = sorted(set(b for b in row[c] if b is not None)) if row[c] else []
        blit = F.array(*[F.lit(float(b)) for b in boundaries])
        # bucket id = #boundaries <= value (NULL maps to bucket 0)
        bucket = F.size(F.filter(blit, lambda b: b <= numeric_exprs[c])).cast("long")
        bucket = F.least(F.greatest(bucket, F.lit(0)), F.lit(n_buckets - 1))
        for bit in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + pos,
                )
            )
    return z


def txn_optimize(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    txn_id: str | None = None,
    max_retries: int = 3,
    zorder_by: list[str] | None = None,
) -> int:
    """OPTIMIZE: transactionally rewrite the table's many small live
    files (streaming appends produce one micro-batch-sized dir each)
    into ~``target_file_bytes`` files. Readers are never disturbed:
    the rewrite stages new files and commits {added, removed} in one
    atomic manifest; a concurrent append winning a version slot aborts
    the attempt (require_latest), whereupon this function deletes its
    staging, re-snapshots the now-larger live set, and retries, up to
    ``max_retries`` times -- data is never at risk because optimize
    changes layout, not content. After the retry budget the last
    ConcurrentWriteError propagates (with staging cleaned up); a
    follow-up vacuum reclaims the files each commit replaced.

    ``zorder_by`` additionally CLUSTERS the rewrite on a Morton
    (Z-order) curve over the given columns: rows land range-
    partitioned and sorted by the interleaved-bit z-value, so every
    output file covers a narrow min/max range in EVERY listed column
    and the manifest-stats skipping (read_snapshot ``where``) prunes
    effectively on any of them -- multi-dimensional data skipping,
    the OPTIMIZE ZORDER BY design. With zorder the rewrite always
    happens (ordering is the point), even when the file count is
    already at target."""
    import shutil

    versions = _versions(table_path)
    if txn_id is not None:
        for v in versions:
            if _read_manifest(table_path, v).get("txn_id") == txn_id:
                return v
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_path}")
    last_err: ConcurrentWriteError | None = None
    for _attempt in range(max(1, max_retries)):
        base_version = _versions(table_path)[-1]
        live = _live_files(table_path, base_version) or []
        if len(live) <= 1 and not (zorder_by and live):
            return base_version  # nothing to merge
        total_bytes = sum(os.path.getsize(f) for f in live if os.path.exists(f))
        n_target = max(1, -(-total_bytes // target_file_bytes))
        if n_target >= len(live) and not zorder_by:
            return base_version  # already at or under target granularity
        current = spark.read.parquet(*live)
        if zorder_by:
            merged = (
                current.withColumn("__z", _zorder_column(current, zorder_by))
                .repartitionByRange(n_target, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            merged = current.repartition(n_target)
        staging = os.path.join(table_path, "data", uuid.uuid4().hex)
        merged.write.parquet(staging)
        files = [
            os.path.join(staging, f)
            for f in os.listdir(staging)
            if f.endswith(".parquet")
        ]
        try:
            return commit(
                table_path,
                files,
                txn_id=txn_id,
                removed_files=live,
                require_latest=base_version,
                stats=collect_file_stats(files),
                data_change=False,  # layout-only: same rows before/after
            )
        except ConcurrentWriteError as e:
            # The table advanced under us; this staging can never be
            # referenced, so delete it rather than leaving an orphan
            # for vacuum, then rewrite against the fresh snapshot.
            shutil.rmtree(staging, ignore_errors=True)
            last_err = e
    raise last_err


def read_changes(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change feed (Delta CDF's ``table_changes`` shape): every row
    added or removed by the data-changing commits in
    ``[from_version, to_version]``, with ``_change_type``
    ('insert' | 'delete') and ``_commit_version`` columns appended.

    File-level copy-on-write makes this exact at file granularity: an
    upsert surfaces the rewritten files' prior rows as deletes and
    the rewrite (survivors + new rows) as inserts -- the NET change is
    row-accurate, though an unchanged row inside a rewritten file
    appears as delete+insert rather than being coalesced (Delta
    without CDF-coalescing behaves the same way). Layout-only commits
    (OPTIMIZE, vacuum checkpoints -- ``data_change=False``) are
    skipped entirely: they change no rows.

    Needs the removed files still on disk, so the feed reaches back
    only as far as vacuum retention -- same contract as Delta CDF.
    Incremental consumers: checkpoint the last version you processed
    and call with ``from_version=checkpoint+1`` (inside foreachBatch
    this composes with the txn_id idempotence for exactly-once
    downstream processing)."""
    from pyspark.sql import functions as F

    versions = _versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_path}")
    if to_version is None:
        to_version = versions[-1]
    if to_version > versions[-1]:
        raise ValueError(
            f"version {to_version} does not exist yet (latest is v{versions[-1]})"
        )
    if from_version < versions[0]:
        raise ValueError(
            f"version {from_version} predates retained history "
            f"(oldest manifest is v{versions[0]}; vacuum pruned earlier changes)"
        )
    parts: list[DataFrame] = []
    for v in versions:
        if not (from_version <= v <= to_version):
            continue
        m = _read_manifest(table_path, v)
        if not m.get("data_change", True):
            continue
        for files, kind in ((m["added"], "insert"), (m.get("removed", []), "delete")):
            if not files:
                continue
            missing = [f for f in files if not os.path.exists(f)]
            if missing:
                raise FileNotFoundError(
                    f"change feed for v{v} needs vacuumed-away files "
                    f"(e.g. {missing[0]}); lower the feed's reach or "
                    "raise vacuum retention"
                )
            parts.append(
                spark.read.parquet(*files).select(
                    "*",
                    F.lit(kind).alias("_change_type"),
                    F.lit(v).cast("int").alias("_commit_version"),
                )
            )
    if not parts:
        # empty but correctly-shaped feed: derive schema from the snapshot
        snap = read_snapshot(spark, table_path, version=to_version)
        return snap.select(
            "*",
            F.lit("insert").alias("_change_type"),
            F.lit(0).cast("int").alias("_commit_version"),
        ).filter(F.lit(False))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def table_history(table_path: str) -> list[dict]:
    """The commit log as data (Delta's DESCRIBE HISTORY): one dict
    per retained version -- version, txn_id, added/removed file
    counts, full flag, commit timestamp."""
    out = []
    for v in _versions(table_path):
        m = _read_manifest(table_path, v)
        out.append(
            {
                "version": m["version"],
                "txn_id": m.get("txn_id"),
                "n_added": len(m["added"]),
                "n_removed": len(m.get("removed", [])),
                "full": bool(m.get("full")),
                "data_change": bool(m.get("data_change", True)),
                "committed_at_ms": m.get("committed_at_ms"),
            }
        )
    return out


def transactional_batch_writer(table_path: str):
    """foreachBatch sink: each micro-batch commits under
    ``txn_id="batch-<epoch>"`` -- Structured Streaming replay of an
    epoch after failure hits the idempotence path and cannot
    double-append. The exactly-once upgrade of SURVEY §4.3 row 1,
    without overwrite directories."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        txn_append(df, table_path, txn_id=f"batch-{epoch_id}")

    return write_batch
