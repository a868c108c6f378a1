"""Optimization round-2 DESIGN ARTIFACT (stamped in OPTIMIZATION_r20.md).

Count-based Jaccard rewrite for operators/dedup.py::ngram_jaccard_pairs
(q51): when the inverted index is complete (max_df=None), |A n B| is the
co-count of shared shingles, so the pair scorer needs no array
materialization -- sizes join + arithmetic replaces array_intersect/
array_union over re-joined shingle arrays. Verified EXACT-EQUAL against
the current implementation on sf0.1 for both the max_df and the
complete-index paths (r20 session; this script is the verification).

dedup.py is frozen this round (r19-cohort fingerprint freeze); apply in
optimization round 2 after the r20 driver run refreshes CORRECTNESS rows
and the window rotates. Run: PYTHONPATH=/root/repo python tools/design_r21_q51_count_jaccard.py
"""
import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from utc_cuip_kafka_aws_connector_spark.session import get_spark
from utc_cuip_kafka_aws_connector_spark.operators.dedup import ngram_jaccard_pairs, sketch_documents
spark = get_spark(app_name="q51ab")
spark.sparkContext.setLogLevel("ERROR")
sf="/root/testdata/sf0.1"
docs_raw = spark.read.parquet(f"{sf}/documents.parquet").filter(F.col("doc_id")<1000)

def ngram_jaccard_pairs_v2(df, id_col, text_col="text", shingle_n=3, threshold=0.5, max_df=None):
    docs = (sketch_documents(df, id_col, text_col, shingle_n, num_hashes=0)
            .select("doc", F.col("sh")).cache())
    inv = docs.select("doc", F.explode("sh").alias("s"))
    if max_df is not None:
        rare = inv.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
        inv = inv.join(rare.select("s"), "s", "left_semi")
    co = (inv.alias("x").join(inv.alias("y"), "s")
          .filter(F.col("x.doc") < F.col("y.doc"))
          .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
          .agg(F.count("*").alias("n_common_indexed")))
    if max_df is None:
        # index complete -> n_common_indexed == |A n B|; sizes join is narrow
        sizes = docs.select("doc", F.size("sh").alias("n_sh"))
        sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("na"))
        sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("nb"))
        return (co.join(sa, "doc_a").join(sb, "doc_b")
                .withColumn("jaccard", F.col("n_common_indexed").cast("double")
                            / (F.col("na")+F.col("nb")-F.col("n_common_indexed")))
                .filter(F.col("jaccard") >= threshold)
                .select("doc_a","doc_b","jaccard"))
    sh_a = docs.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    jacc = (F.size(F.array_intersect("sh_a","sh_b")).cast("double")/F.size(F.array_union("sh_a","sh_b")))
    return (co.select("doc_a","doc_b").join(sh_a,"doc_a").join(sh_b,"doc_b")
            .withColumn("jaccard", jacc).filter(F.col("jaccard")>=threshold)
            .select("doc_a","doc_b","jaccard"))

# correctness: q51 uses max_df=1000 -> still array path. Try BOTH: also check whether
# count-based equals array-based when every shared shingle survives the df cap.
r_old = sorted(map(tuple, ngram_jaccard_pairs(docs_raw, id_col="doc_id", max_df=1000).collect()))
r_new = sorted(map(tuple, ngram_jaccard_pairs_v2(docs_raw, id_col="doc_id", max_df=1000).collect()))
print("max_df=1000 array path equal:", r_old == r_new)
r_old0 = sorted(map(tuple, ngram_jaccard_pairs(docs_raw, id_col="doc_id").collect()))
r_new0 = sorted(map(tuple, ngram_jaccard_pairs_v2(docs_raw, id_col="doc_id").collect()))
print("max_df=None count path equal:", r_old0 == r_new0, len(r_old0))

def timeit(fn, reps=3):
    ts=[]
    for _ in range(reps):
        spark.catalog.clearCache()
        t0=time.perf_counter(); fn().collect(); ts.append(time.perf_counter()-t0)
    return ts
for name, fn in [("old_maxdf", lambda: ngram_jaccard_pairs(docs_raw, id_col="doc_id", max_df=1000)),
                 ("new_maxdf", lambda: ngram_jaccard_pairs_v2(docs_raw, id_col="doc_id", max_df=1000)),
                 ("old_none", lambda: ngram_jaccard_pairs(docs_raw, id_col="doc_id")),
                 ("new_none", lambda: ngram_jaccard_pairs_v2(docs_raw, id_col="doc_id"))]:
    ts = timeit(fn); print(name, [f"{t:.2f}" for t in ts], f"min {min(ts):.2f}", flush=True)
