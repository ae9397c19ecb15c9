"""Round-6 isolation benchmarks (guide §1.4) — bench.py itself is frozen.

Times individual library operators exactly the way bench.py does (same
session shape, same inputs), optionally with the noop sink, so per-change
before/after numbers can be taken without re-running the whole bench.
Usage: python bench_extra.py <query>[,<query>...] [--noop] [--explain]
Queries: minhash, doc_stats, embed_topk, frontier_ops
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import SF_DIR, CPUS, build_spark, _spread  # noqa: E402


def minhash_df(spark):
    from remilia_spark.datapipe import dedup
    docs = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"), CPUS)
    return dedup.minhash_near_duplicates(docs, k=3, num_perm=16, bands=4,
                                         threshold=0.5)


def doc_stats_df(spark):
    from pyspark.sql import functions as F
    from remilia_spark.datapipe import textstats
    docs = _spread(spark.read.parquet(f"{SF_DIR}/documents.parquet"), CPUS)
    q = textstats.quality_score(docs)
    l = textstats.lang_id(docs)
    fp = textstats.fingerprint(docs)
    return q.join(l, "doc_id").join(fp, "doc_id") \
        .agg(F.sum("quality"), F.count(F.lit(1)))


def embed_topk_df(spark):
    from pyspark.sql import functions as F
    from remilia_spark.datapipe import similarity
    emb = _spread(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), CPUS)
    return similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 32), k=10)


def frontier_ops_df(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    ev = _spread(spark.read.parquet(f"{SF_DIR}/events.parquet"), CPUS)
    seen = ev.where(F.col("event_id") % 10 < 3).select("user_id").distinct()
    fresh = ev.join(seen, "user_id", "left_anti")
    w = Window.partitionBy(F.col("user_id") % 50).orderBy("ts", "event_id")
    return fresh.withColumn("r", F.row_number().over(w)).where(F.col("r") <= 5)


DFS = {"minhash": minhash_df, "doc_stats": doc_stats_df,
       "embed_topk": embed_topk_df, "frontier_ops": frontier_ops_df}


def main():
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(DFS)
    noop = "--noop" in sys.argv
    explain = "--explain" in sys.argv
    reps = int(os.environ.get("REPS", "3"))
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        df = DFS[name](spark)
        if explain:
            print(f"==== {name} ====")
            df.explain("formatted")
            continue
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            d = DFS[name](spark)
            t0 = time.monotonic()
            if noop:
                d.write.format("noop").mode("overwrite").save()
            else:
                d.count()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = times
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
