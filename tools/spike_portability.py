"""Spike: verify Spark-vs-DuckDB bit-compatibility of the expression idioms
the oracle queries rely on (md5, split, cosine-as-double, instr/strpos)."""
import duckdb
from tiflow_spark.session import get_spark

sf = "/root/testdata/sf0.01"
spark = get_spark(cpus=4, shuffle_partitions=8)
con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

emb = spark.read.parquet(f"{sf}/embeddings.parquet")
emb.createOrReplaceTempView("embeddings")

# cosine via explicit double aggregate, pairwise on 20x20 ids
q_spark = spark.sql("""
  SELECT a.vec_id qa, b.vec_id qb,
    aggregate(zip_with(cast(a.embedding as array<double>), cast(b.embedding as array<double>), (x,y)->x*y), 0d, (acc,x)->acc+x)
    / (sqrt(aggregate(cast(a.embedding as array<double>), 0d, (acc,x)->acc+x*x))
      * sqrt(aggregate(cast(b.embedding as array<double>), 0d, (acc,x)->acc+x*x))) cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND b.vec_id < 20
""").collect()
q_duck = con.sql("""
  SELECT a.vec_id qa, b.vec_id qb,
    list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
    / (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
      * sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND b.vec_id < 20
""").fetchall()
ds = {(r.qa, r.qb): r.cos for r in q_spark}
dd = {(a, b): c for a, b, c in q_duck}
diffs = [abs(ds[k]-dd[k]) for k in ds]
print("cosine pairs:", len(ds), "max abs diff:", max(diffs))

# md5 / instr / split
r1 = spark.sql("select md5('5:hello world'), instr('0123456789abcdef','c'), size(split('a b  c',' '))").collect()[0]
r2 = con.sql("select md5('5:hello world'), strpos('0123456789abcdef','c'), len(string_split('a b  c',' '))").fetchone()
print("md5 equal:", r1[0]==r2[0], "| instr:", r1[1], r2[1], "| split size:", r1[2], r2[2])
spark.stop()
