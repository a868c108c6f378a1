"""Round-21 dedup-family A/B: the pre-r21 dedup.py/similarity.py
(loaded from git at d87015e, the commit before the r21 edits) vs the
current modules, interleaved in one window at sf0.1 with the bench
methodology (warm engine, cold data, collect()).

Covers the three r21 changes to the family:
  - ngram_jaccard_pairs count-based Jaccard (q51, and q80's pair source)
  - connected_components one-job-per-round loop (q80/q81/q110)
  - scale-conditional fan-outs (no local delta expected: the local
    scan is 1 partition, so the guard still fires — q94 precedent)

Also checks old == new row-for-row at sf0.1 (normalized multisets).

Run: PYTHONPATH=/root/repo:/root/repo/tests python tools/measure_r21_dedup_family.py
"""
import importlib.util
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import functions as F

from oracle_utils import normalize
from utc_cuip_kafka_aws_connector_spark.session import get_spark
from utc_cuip_kafka_aws_connector_spark.operators import semdedup
from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

OLD_REF = "d87015e"


def load_old(path: str, name: str):
    src = subprocess.check_output(
        ["git", "show", f"{OLD_REF}:{path}"], cwd="/root/repo", text=True
    )
    tmp = f"/tmp/{name}.py"
    with open(tmp, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(name, tmp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


dedup_old = load_old(
    "utc_cuip_kafka_aws_connector_spark/operators/dedup.py", "dedup_old"
)
sim_old = load_old(
    "utc_cuip_kafka_aws_connector_spark/operators/similarity.py", "sim_old"
)

spark = get_spark(app_name="dedup_family_ab")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def docs_lt1000():
    return spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 1000
    )


def emb_corpus(offset):
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < 500)
        .select("vec_id", "embedding")
    )
    return emb.unionByName(
        emb.select((F.col("vec_id") + offset).alias("vec_id"), "embedding")
    )


def q51_old():
    return dedup_old.ngram_jaccard_pairs(docs_lt1000(), id_col="doc_id", max_df=1000)


def q80_old():
    d = docs_lt1000()
    return dedup_old.dedup_clusters(
        d, dedup_old.ngram_jaccard_pairs(d, id_col="doc_id"), id_col="doc_id"
    )


def q81_old():
    corpus = emb_corpus(100_000)
    pairs = sim_old.lsh_ann_pairs(corpus, cos_threshold=0.9, dim=64)
    return dedup_old.dedup_clusters(
        corpus, pairs, id_col="vec_id", src="id_a", dst="id_b"
    )


def q110_old():
    # semantic_dedup resolves its collaborators through module globals;
    # point them at the OLD kernels for the old variant, restore after.
    saved = (semdedup.dedup_clusters, semdedup.ivf_assign)
    semdedup.dedup_clusters, semdedup.ivf_assign = (
        dedup_old.dedup_clusters,
        sim_old.ivf_assign,
    )
    try:
        return semdedup.semantic_dedup(
            emb_corpus(200_000), n_clusters=16, cos_threshold=0.9
        )
    finally:
        semdedup.dedup_clusters, semdedup.ivf_assign = saved


VARIANTS = {
    "q51": (q51_old, lambda: CATALOG["q51_ngram_jaccard_pairs"].builder(spark, SF)),
    "q80": (q80_old, lambda: CATALOG["q80_near_dup_clusters"].builder(spark, SF)),
    "q81": (q81_old, lambda: CATALOG["q81_embedding_dedup"].builder(spark, SF)),
    "q110": (q110_old, lambda: CATALOG["q110_semantic_dedup"].builder(spark, SF)),
}


def drop_all_blocks():
    spark.catalog.clearCache()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist()


for name, (old_fn, new_fn) in VARIANTS.items():
    a = normalize(old_fn().toPandas())
    drop_all_blocks()
    b = normalize(new_fn().toPandas())
    drop_all_blocks()
    print(f"{name}: n={len(a)} old==new: {a == b}", flush=True)

for name, (old_fn, new_fn) in VARIANTS.items():
    times = {"old": [], "new": []}
    for fn in (old_fn, new_fn):  # warm both plans
        fn().collect()
        drop_all_blocks()
    for _ in range(3):
        for tag, fn in (("old", old_fn), ("new", new_fn)):
            drop_all_blocks()
            t0 = time.perf_counter()
            fn().collect()
            times[tag].append(time.perf_counter() - t0)
    for tag, ts in times.items():
        s = sorted(ts)
        print(
            f"{name} {tag}: {['%.2f' % t for t in ts]} min {s[0]:.2f} med {s[1]:.2f}",
            flush=True,
        )
