"""Build a ~sf10 fixture at /tmp/sf10: FACT tables (orders, lineitem,
events) replicated 100x from sf0.1 with consistent key shifts — the
orderkey shift is shared by lineitem+orders so join structure is
preserved; event_id shifts keep the PK unique. Dimensions copy
unchanged (they would not grow 100x in a real star either).

documents/embeddings stay at the sf1 10x (copied from /tmp/sf1, built
first by mk_sf1.py): the fixture corpus is a fixed-template synthetic —
replicating it 100x creates 100-member EXACT-duplicate clusters whose
quadratic all-pairs candidate sets measure the fixture's degeneracy,
not the operators (the df-capped paths stay linear, but q204's exact
prefix filter has no cap by design). Fact-side scale is what sf10
probes; the corpus operators have their own 10x soak.
"""
import duckdb, os, shutil, sys

src = "/root/testdata/sf0.1"
sf1 = "/tmp/sf1"
dst = "/tmp/sf10"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")

K = con.execute(f"SELECT max(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
E = con.execute(f"SELECT max(event_id) + 1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
print("orderkey shift:", K, "event shift:", E)

con.execute(f"""
COPY (SELECT * REPLACE (o_orderkey + i * {K} AS o_orderkey)
      FROM read_parquet('{src}/orders.parquet'), range(100) t(i))
TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT * REPLACE (l_orderkey + i * {K} AS l_orderkey)
      FROM read_parquet('{src}/lineitem.parquet'), range(100) t(i))
TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT * REPLACE (event_id + i * {E} AS event_id)
      FROM read_parquet('{src}/events.parquet'), range(100) t(i))
TO '{dst}/events.parquet' (FORMAT PARQUET)""")

for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
for t in ["documents", "embeddings"]:
    shutil.copy(f"{sf1}/{t}.parquet", f"{dst}/{t}.parquet")

for t in ["orders", "lineitem", "events"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n)
