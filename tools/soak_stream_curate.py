"""Soak-test `stream-curate` state maintenance at daemon timescales.

The r14 probe showed 2 epochs; this drives the real question (owed
since the r14 brief): does per-batch cost stay FLAT over 50-100
CRON-style invocations, i.e. does the compaction + Bloom machinery
actually bound listing and anti-join cost, or does state creep back?

One epoch == one daemon wake-up: append one jsonl file of fresh docs
(a fixed fraction duplicating earlier epochs' text, so the cross-batch
dedup path does real work every batch), then run the SAME
`run_stream_curate` call the CLI dispatches (same checkpoint — the
file source picks up exactly the new file as one micro-batch).

Per epoch it records: wall-clock of the invocation, the number of
live state directories (raw hash dirs + hash snapshots + band dirs +
band snapshots), and the time to LIST that state the way the consumer
does (Hadoop FS listStatus). Prints one summary table + octile means
at the end — "flat" means the last octile is within noise of the
first, with sawtooth resets at each compaction.

Usage (repo root):
    python tools/soak_stream_curate.py [epochs] [docs_per_epoch]
Defaults: 64 epochs x 200 docs, --compact-every 8, near-dup on (0.8).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

WORDS = (
    "the cat dog sat tree fish river stone cloud light brick tower "
    "glass paper north river maple stone ember quill frost cedar"
).split()


def make_doc(epoch: int, i: int, n: int = 40) -> str:
    r = random.Random(epoch * 100_003 + i)
    return " ".join(r.choice(WORDS) for _ in range(n))


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    compact_every = 8
    from utc_cuip_kafka_aws_connector_spark.cli import run_stream_curate
    from utc_cuip_kafka_aws_connector_spark.operators.tableread import (
        _fs_and_path,
    )
    from utc_cuip_kafka_aws_connector_spark.session import get_spark

    spark = get_spark(app_name="stream-curate-soak")
    base = tempfile.mkdtemp(prefix="soak_")
    inp = os.path.join(base, "in")
    out = os.path.join(base, "out")
    ckp = os.path.join(base, "ckp")
    os.makedirs(inp)

    def state_dirs_and_listing() -> tuple[int, float]:
        roots = [
            f"{out}/_seen_hashes", f"{out}/_seen_compact",
            f"{out}/_seen_bands", f"{out}/_seen_bands_compact",
        ]
        t0 = time.time()
        n = 0
        for root in roots:
            fs, jpath, _ = _fs_and_path(spark, root)
            if fs.exists(jpath):
                n += len(fs.listStatus(jpath))
        return n, time.time() - t0

    rows = []
    for e in range(epochs):
        with open(os.path.join(inp, f"epoch_{e:04d}.jsonl"), "w") as fh:
            for i in range(per_epoch):
                if e > 0 and i % 10 == 0:
                    # 10% exact dups of the previous epoch: the
                    # cross-batch anti-join must kill these
                    text = make_doc(e - 1, i + 1)
                else:
                    text = make_doc(e, i)
                fh.write(json.dumps(
                    {"doc_id": e * 10_000 + i, "text": text, "lang": "en"}
                ) + "\n")
        t0 = time.time()
        run_stream_curate(
            spark, inp, out, ckp,
            min_quality=0.0,
            compact_every=compact_every,
            near_dup_threshold=0.8,
        )
        wall = time.time() - t0
        n_dirs, list_sec = state_dirs_and_listing()
        rows.append((e, wall, n_dirs, list_sec))
        print(f"epoch {e:3d}  wall {wall:6.2f}s  state_dirs {n_dirs:3d}  "
              f"listing {list_sec*1e3:6.1f}ms", flush=True)

    k = max(1, len(rows) // 8)
    print("\noctile means (epoch range: wall s / state dirs / listing ms):")
    for o in range(0, len(rows), k):
        chunk = rows[o:o + k]
        print(f"  {chunk[0][0]:3d}-{chunk[-1][0]:3d}: "
              f"{sum(r[1] for r in chunk)/len(chunk):6.2f}s  "
              f"{sum(r[2] for r in chunk)/len(chunk):6.1f}  "
              f"{sum(r[3] for r in chunk)/len(chunk)*1e3:6.1f}ms")
    kept = spark.read.parquet(f"{out}/data").count()
    total = epochs * per_epoch
    print(f"\nkept {kept}/{total} docs "
          f"({total - kept} suppressed as exact/near dups)")
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
