"""r16 A/B: per-pair cosine formulations on the exact all-pairs dedup
shape (sf0.1 embeddings, 2M pairs). Variants: (a) HOF folds per pair,
(b) statically-unrolled 64-dim chains, (c) hoisted per-row norms + HOF
dot, (d) hoisted norms + unrolled dot. Measured 2026-08-18 (local[32],
quiet): a=63.1s b=225.8s c=30.1s d=83.2s -- unrolling LOSES (the stage
falls out of codegen and the boxed 1.5k-node tree is slower than the
compact CodegenFallback fold); hoisting wins. The shipped operator
adds the LeftAnti short-circuit on top of (c): 10.6s.
"""
import sys, os, time
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master('local[32]')
         .config('spark.ui.enabled','false')
         .config('spark.ui.showConsoleProgress','false')
         .config('spark.sql.codegen.maxFields','200')
         .config('spark.sql.shuffle.partitions','32').getOrCreate())
spark.sparkContext.setLogLevel('WARN')
from file_stream_import_spark.io.tables import load_table
sf='/root/testdata/sf0.1'
e = load_table(spark, sf, 'embeddings')
ids = e.select("vec_id", "embedding")

def hof_dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, t: acc + t)
def hof_norm(x):
    return F.sqrt(F.aggregate(x, F.lit(0.0), lambda acc, t: acc + t * t))
def unr_dot(x, y, d):
    acc = x[0]*y[0]
    for i in range(1, d): acc = acc + x[i]*y[i]
    return acc
def unr_norm(x, d):
    acc = x[0]*x[0]
    for i in range(1, d): acc = acc + x[i]*x[i]
    return F.sqrt(acc)

def sides(with_norm=None):
    a = ids.select(F.col("vec_id").alias("id_a"), F.col("embedding").cast("array<double>").alias("va"))
    b = ids.select(F.col("vec_id").alias("id_b"), F.col("embedding").cast("array<double>").alias("vb"))
    if with_norm == "hof":
        a = a.withColumn("na", hof_norm(F.col("va")))
        b = b.withColumn("nb", hof_norm(F.col("vb")))
    elif with_norm == "unr":
        a = a.withColumn("na", unr_norm(F.col("va"), 64))
        b = b.withColumn("nb", unr_norm(F.col("vb"), 64))
    return a, b

def variant(name):
    if name == "a_hof_full":
        a, b = sides()
        cos = hof_dot(F.col("va"), F.col("vb")) / (hof_norm(F.col("va")) * hof_norm(F.col("vb")))
    elif name == "b_unr_full":
        a, b = sides()
        cos = unr_dot(F.col("va"), F.col("vb"), 64) / (unr_norm(F.col("va"), 64) * unr_norm(F.col("vb"), 64))
    elif name == "c_hoist_hofdot":
        a, b = sides("hof")
        cos = hof_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    elif name == "d_hoist_unrdot":
        a, b = sides("unr")
        cos = unr_dot(F.col("va"), F.col("vb"), 64) / (F.col("na") * F.col("nb"))
    pairs = b.join(F.broadcast(a), F.col("id_a") < F.col("id_b"))
    return pairs.withColumn("cos", cos).filter(F.col("cos") >= 0.4).select("id_b").distinct()

order = ["a_hof_full","b_unr_full","c_hoist_hofdot","d_hoist_unrdot"]
variant("a_hof_full").limit(1).collect()  # warmup
res={}
for rep in range(2):
    for name in order:
        df = variant(name)
        t0=time.time(); df.write.format("noop").mode("overwrite").save()
        el=time.time()-t0; res.setdefault(name,[]).append(el)
        print(f"rep{rep} {name}: {el:.2f}s", flush=True)
print("mins:", {k: round(min(v),2) for k,v in res.items()}, flush=True)
