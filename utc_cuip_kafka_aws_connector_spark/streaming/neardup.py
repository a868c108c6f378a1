"""Streaming near-duplicate suppression: MinHash-LSH matching of
arriving documents against everything already seen, with bounded
per-bucket state.

``streaming/ops.py::streaming_dedup`` only drops EXACT key repeats;
production ingest (the 100 TB training-data case: a crawler feed, a
Kafka firehose) also needs "is this document a near-copy of one we
already accepted?" — online, without re-scanning the corpus. The
batch family in ``operators/dedup.py`` answers that offline; this
module is its streaming counterpart, the same public MinHash-LSH
construction (Broder 1997; banding as in Leskovec/Rajaraman/Ullman
ch.3) run incrementally:

1. stateless: ``operators/lshbands.py::banded_signatures`` (shared
   with the incremental batch dedup in operators/increddup.py; one
   vectorized Arrow sketch pass) -> signature -> ``bands`` band keys
   per doc.
2. stateful: ``applyInPandasWithState`` per band key. State is the
   bucket's previously seen (id, signature) rows, packed to a single
   binary blob (ids array + flat int64 signature matrix), capped at
   ``bucket_cap`` entries — state per bucket is O(cap * num_hashes)
   bytes REGARDLESS of stream length, and an LSH bucket that
   legitimately exceeds the cap is a boilerplate flood whose members
   already match the retained prototypes. Arriving docs are compared
   (vectorized equal-component fraction — the unbiased MinHash
   Jaccard estimator) against the bucket's residents in doc-id order
   (so same-micro-batch duplicates match their earlier sibling).
3. Each band emits (doc, match, sim); a doc appears once per band it
   hashes into, so ``collapse_matches`` (a plain batch aggregation,
   run inside foreachBatch or on the materialized output) reduces to
   one best-match row per doc: near-dup iff any band matched at
   ``sim_threshold``.

Multi-band coordination is deliberately NOT a second stateful
stage: chaining stateful operators in one streaming query is
restricted, and the per-band match stream is already append-safe;
the cheap per-doc max is batch work.

State lifetime: NoTimeout + cap here (buckets are prototype sets,
not per-key aggregates — eviction would forget the very documents
dedup exists to remember); pair with the RocksDB provider
(ops.rocksdb_state_conf) when bucket count is large.

Reference basis: the reference connector re-delivers dup rows
at-least-once and never dedups (SURVEY R23); streaming near-dup is
§2.D training-data scope, public-algorithm implementation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.lshbands import (
    banded_signatures,
)


def near_dup_matches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    bucket_cap: int = 64,
) -> DataFrame:
    """Streaming (or batch-replayed) per-band match stream:
    (band_key, doc, match, sim) where ``match`` is the best same-
    bucket prior document (null if the bucket was empty so far) and
    ``sim`` the estimated Jaccard against it. Feed through
    ``collapse_matches`` for the per-doc verdict."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    H = num_hashes

    def update(key, pdfs: Iterator[pd.DataFrame], state):
        ids: list
        if state.exists:
            ids_tuple, blob = state.get
            ids = list(ids_tuple)
            stored = np.frombuffer(blob, dtype=np.int64).reshape(-1, H)
        else:
            ids = []
            stored = np.empty((0, H), dtype=np.int64)
        out_doc, out_match, out_sim = [], [], []
        for pdf in pdfs:
            for row in pdf.sort_values("doc").itertuples(index=False):
                sig = np.asarray(row.sig, dtype=np.int64)
                if len(stored):
                    sims = (stored == sig).mean(axis=1)
                    j = int(np.argmax(sims))
                    out_match.append(int(ids[j]))
                    out_sim.append(float(sims[j]))
                else:
                    out_match.append(None)
                    out_sim.append(0.0)
                out_doc.append(int(row.doc))
                if len(ids) < bucket_cap:
                    ids.append(int(row.doc))
                    stored = np.vstack([stored, sig[None, :]])
        state.update((ids, stored.tobytes()))
        yield pd.DataFrame(
            {
                "band_key": np.full(len(out_doc), key[0], dtype=np.int64),
                "doc": out_doc,
                "match": pd.array(out_match, dtype="Int64"),
                "sim": out_sim,
            }
        )

    banded = banded_signatures(
        df, id_col, text_col, num_hashes, bands, shingle_n
    )
    return banded.groupBy("band_key").applyInPandasWithState(
        update,
        outputStructType="band_key long, doc long, match long, sim double",
        stateStructType="ids array<long>, sigs binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def collapse_matches(matches: DataFrame, sim_threshold: float = 0.7) -> DataFrame:
    """Batch reduction of the per-band match stream to one row per
    doc: (doc, dup_of, sim, is_dup). Best = highest sim, then lowest
    matched id (deterministic); ``is_dup`` applies the threshold.
    Run inside foreachBatch or over the materialized stream output."""
    # single aggregation, no self-join: unmatched bands rank at
    # sim -1 so any matched band beats them; ties broken toward the
    # lowest matched id via the negated second struct field
    ranked = F.struct(
        F.when(F.col("match").isNotNull(), F.col("sim"))
        .otherwise(F.lit(-1.0))
        .alias("sim"),
        (-F.coalesce(F.col("match"), F.lit(-(1 << 62)))).alias("nm"),
        F.col("match").alias("match"),
    )
    return (
        matches.groupBy("doc")
        .agg(F.max(ranked).alias("b"))
        .select(
            "doc",
            F.col("b.match").alias("dup_of"),
            F.greatest(F.col("b.sim"), F.lit(0.0)).alias("sim"),
            (F.col("b.sim") >= F.lit(sim_threshold)).alias("is_dup"),
        )
    )
