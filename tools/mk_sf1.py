"""Build a ~sf1 fixture at /tmp/sf1 by replicating sf0.1's fact tables 10x
with consistent key shifts (lineitem+orders share the orderkey shift so the
join structure is preserved); dimension and LLM tables copy unchanged."""
import duckdb, os, shutil

src = "/root/testdata/sf0.1"
dst = "/tmp/sf1"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

K = con.execute(f"SELECT max(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
print("orderkey shift:", K)

con.execute(f"""
COPY (SELECT * REPLACE (o_orderkey + i * {K} AS o_orderkey)
      FROM read_parquet('{src}/orders.parquet'), range(10) t(i))
TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT * REPLACE (l_orderkey + i * {K} AS l_orderkey)
      FROM read_parquet('{src}/lineitem.parquet'), range(10) t(i))
TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

for t in ["region", "nation", "customer", "supplier", "part",
          "events", "documents", "embeddings"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

for t in ["orders", "lineitem"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n)
