"""16x-scale probe for dedup_containment's width-pinned pair exchange
(r14 verdict watch item 8a).

Replicates the sf0.1 documents corpus 16x (shifted doc_ids keep the
dup structure) and times the pair tail with and without the
width-pinned repartition ahead of the (id_a, id_b) count.

Measured r15 (this host): pinned 162-210 s, unpinned 114.8 s — at
volume AQE parallelizes the final aggregate fine and the pin is a pure
extra raw-pair shuffle, while at sf0.1 the pin wins 3.4 s vs 7.2 s
(AQE byte-coalescing serializes the tail) and partial aggregation
compresses nothing (25.5 MB partial exchange vs 23.2 MB raw).  Hence
the size guard in q_dedup_containment.

Usage: python tools/containment_16x_probe.py pin|nopin
"""
import sys; sys.path.insert(0, "/root/repo")
import time, os, sys
os.environ.setdefault("SPARK_GRAFT_CPUS","32")
from rc_scanner_spark.session import get_spark
from rc_scanner_spark.tables import load_table
from pyspark.sql import functions as F

spark = get_spark("cont16x")
sf="/root/testdata/sf0.1"
pin = sys.argv[1] == "pin"
d0 = load_table(spark, sf, "documents").select("doc_id","text")
# 16x corpus: shifted ids keep the dup structure, 16x the volume
d = d0.crossJoin(spark.range(16).select(F.col("id").alias("rep"))).select(
    (F.col("doc_id")+F.col("rep")*F.lit(10_000_000)).alias("doc_id"), "text")
ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
sh = F.array_distinct(
    F.when(F.size(ws) >= 3,
        F.transform(F.sequence(F.lit(1), F.size(ws)-2),
                    lambda i: F.concat_ws(" ", F.slice(ws, i, 3))))
    .when(F.size(ws) > 0, F.array(F.concat_ws(" ", ws)))
    .otherwise(F.array().cast("array<string>")))
P = spark.sparkContext.defaultParallelism
s = d.repartition(P, "doc_id").select("doc_id", sh.alias("sh"))
e = s.select("doc_id", F.explode("sh").alias("tok")).persist()
df_ok = e.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= 800)
eb = e.join(df_ok.select("tok"), "tok").repartition(P, "tok").persist()
na_f = eb.groupBy("doc_id").agg(F.count(F.lit(1)).alias("na"))
a = eb.select(F.col("doc_id").alias("id_a"), "tok")
b = eb.select(F.col("doc_id").alias("id_b"), "tok")
cand = a.join(b, "tok").filter(F.col("id_a") != F.col("id_b"))
if pin:
    cand = cand.repartition(P, "id_a", "id_b")
pairs = (cand.groupBy("id_a","id_b").agg(F.count(F.lit(1)).alias("n_common"))
    .join(na_f, F.col("id_a")==F.col("doc_id"))
    .withColumn("containment", F.round(F.col("n_common")/F.col("na"),4))
    .filter(F.col("containment") >= 0.8).select("id_a","id_b","containment"))
eb.count()
t0=time.perf_counter()
pairs.write.format("noop").mode("overwrite").save()
print(f"pin={pin} tail_wall={time.perf_counter()-t0:.2f}s", flush=True)
