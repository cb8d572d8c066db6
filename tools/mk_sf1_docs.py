"""Build /tmp/sf1docs: /tmp/sf1 (run mk_sf1.py first) plus documents and
embeddings replicated 10x with id shifts — the LLM-ops scale soak fixture.

Documents replicate with IDENTICAL text (10-member exact-dup clusters: the
realistic web-crawl shape, and real work for every dedup path). Embeddings
perturb dimension 0 by i*1e-4 per replica so copies are NEAR-duplicates
(cosine ~ 1 - 1e-9) without exact top-k ties."""
import duckdb, os, shutil

src = "/tmp/sf1"
dst = "/tmp/sf1docs"
assert os.path.isdir(src), "run tools/mk_sf1.py first"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

D = con.execute(f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
V = con.execute(f"SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]
print("doc shift:", D, "vec shift:", V)

con.execute(f"""
COPY (SELECT doc_id + i * {D} AS doc_id, text, lang, source, n_chars
      FROM read_parquet('{src}/documents.parquet'), range(10) t(i))
TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT vec_id + i * {V} AS vec_id,
             list_transform(embedding, (x, j) ->
               CASE WHEN j = 1 THEN CAST(x + i * 0.0001 AS FLOAT) ELSE x END) AS embedding,
             label
      FROM read_parquet('{src}/embeddings.parquet'), range(10) t(i))
TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

for t in ["documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n)
