"""Build the DIMS-SCALED soak fixture at /tmp/sf1dims: BOTH fact and
dimension tables replicated 10x from sf0.1 with consistent key shifts
(dev tool only; the shipped library is pure Scala).

Why this fixture exists: mk_sf10.py replicates FACTS while holding
dimensions fixed — which is how the r10 q288/q290 seed-fraction
quadratic survived two soaks (a `s_suppkey % 25` screen selects a fixed
FRACTION of supplier, so |seeds| never grew in any facts-only soak even
though it grows O(SF) in real TPC-H scaling). Here every table that
scales with SF in real TPC-H scales together: customer, supplier, part,
orders, lineitem, events, embeddings, documents, all x10, with shifts
applied consistently on every foreign key so join structure is
preserved (each replica i references replica i's dimension rows — the
graph becomes 10 structure-identical components, which is conservative
but sufficient: any operator whose working set is a fixed fraction of a
dimension shows 10x the per-seed work here, while a bounded-panel
operator's working set stays flat).

Checks that should hold on this fixture:
  - q288/q290 (fixed seed panel): working set flat vs sf0.1 — the
    panel's 40 lowest suppkeys all land in replica 0.
  - the r10 mod-screen form would have selected 400 seeds here — the
    defect this fixture is designed to catch.
  - q193 (fraction probe pool): probes x10 AND corpus x10 — measures
    the brute-force candidate pass's quadratic shape directly.
"""
import duckdb, os, shutil

src = "/root/testdata/sf0.1"
dst = "/tmp/sf1dims"
D = 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")

shift = {}
for t, k in [("orders", "o_orderkey"), ("customer", "c_custkey"),
             ("supplier", "s_suppkey"), ("part", "p_partkey"),
             ("events", "event_id"), ("embeddings", "vec_id"),
             ("documents", "doc_id")]:
    shift[t] = con.execute(
        f"SELECT max({k}) + 1 FROM read_parquet('{src}/{t}.parquet')"
    ).fetchone()[0]
print("shifts:", shift)

K, C, S, P, E, V, DOC = (shift["orders"], shift["customer"],
                         shift["supplier"], shift["part"],
                         shift["events"], shift["embeddings"],
                         shift["documents"])

reps = {
    "customer": f"c_custkey + i * {C} AS c_custkey",
    "supplier": f"s_suppkey + i * {S} AS s_suppkey",
    "part": f"p_partkey + i * {P} AS p_partkey",
    "orders": (f"o_orderkey + i * {K} AS o_orderkey, "
               f"o_custkey + i * {C} AS o_custkey"),
    "lineitem": (f"l_orderkey + i * {K} AS l_orderkey, "
                 f"l_suppkey + i * {S} AS l_suppkey, "
                 f"l_partkey + i * {P} AS l_partkey"),
    "events": (f"event_id + i * {E} AS event_id, "
               f"user_id + i * {C} AS user_id"),
    "embeddings": f"vec_id + i * {V} AS vec_id",
    "documents": f"doc_id + i * {DOC} AS doc_id",
}
for t, rep in reps.items():
    con.execute(f"""
COPY (SELECT * REPLACE ({rep})
      FROM read_parquet('{src}/{t}.parquet'), range({D}) t(i))
TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")

for t in ["region", "nation"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

for t in list(reps) + ["region", "nation"]:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
    ).fetchone()[0]
    print(t, n)
