#!/usr/bin/env python3
"""Scaling-rehearsal data generator (VERDICT r11 #6): synthesize an
sf1-shaped dataset (10x sf0.1) under /tmp so the bench can measure each
headline query's empirical scaling exponent. NOT a correctness input --
the oracle gate stays on the driver-generated testdata; this exists only
to catch operators whose cost curve the sf0.1 bench cannot see.

Replication scheme: 10 copies with disjoint key spaces (ids shifted by
copy*10^9; nation/region dims stay single-copy so FK joins hold within
each copy). Text is word-shuffled per copy (deterministic hash order) so
copies are NOT near-duplicates of each other -- a naive replica would
hand every dedup op a 10-clique per document and measure clique blowup,
not corpus scaling. Embeddings get per-copy deterministic jitter for the
same reason. Events/docs/vectors keep their per-copy internal structure
(sessions, planted dups, cluster geometry) untouched.
"""
import duckdb, os, sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 10**9

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.sql(f"CREATE TABLE copies AS SELECT unnest(range(0, {COPIES})) AS c")

def emit(name, sql):
    con.sql(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

for t in ("region", "nation"):
    emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

emit("customer", f"""
  SELECT c_custkey + c*{SHIFT} AS c_custkey,
         c_name || '#' || c AS c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', copies""")

emit("supplier", f"""
  SELECT s_suppkey + c*{SHIFT} AS s_suppkey,
         s_name || '#' || c AS s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet', copies""")

emit("part", f"""
  SELECT p_partkey + c*{SHIFT} AS p_partkey, p_name || '#' || c AS p_name,
         p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet', copies""")

emit("orders", f"""
  SELECT o_orderkey + c*{SHIFT} AS o_orderkey, o_custkey + c*{SHIFT} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', copies""")

emit("lineitem", f"""
  SELECT l_orderkey + c*{SHIFT} AS l_orderkey, l_partkey + c*{SHIFT} AS l_partkey,
         l_suppkey + c*{SHIFT} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', copies""")

# events: shifted ids/users, small per-copy ts offset so sessions/windows
# keep their in-copy shape without cross-copy pileups on the same instants
emit("events", f"""
  SELECT event_id + c*{SHIFT} AS event_id,
         ts + to_microseconds(c * 137) AS ts,
         user_id + c*{SHIFT} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet', copies""")

# documents: word-shuffle per copy (deterministic hash order) -- copies
# share vocabulary but not shingles, so near-dup structure stays in-copy
emit("documents", f"""
  WITH w AS (
    SELECT doc_id, c, lang, source, n_chars,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM '{SRC}/documents.parquet', copies)
  SELECT doc_id + c*{SHIFT} AS doc_id,
         CASE WHEN c = 0 THEN string_agg(word, ' ' ORDER BY i)
              ELSE string_agg(word, ' ' ORDER BY hash(doc_id*131 + i*7 + c), i) END AS text,
         lang, source, n_chars
  FROM w GROUP BY doc_id, c, lang, source, n_chars""")

# embeddings: per-copy deterministic ORTHOGONAL transform (dimension
# permutation + sign flips). Within-copy geometry -- clusters, planted
# dups, every pairwise cosine -- is preserved EXACTLY, while cross-copy
# cosines collapse to ~0 (random signs cancel the inner product), so
# copies are distinct domains, not near-dup echoes. A plain jitter left
# copies at cosine ~0.97, handing every embed-dedup op an artificial
# 10-clique per vector and measuring clique blowup instead of scaling.
emit("embeddings", f"""
  WITH dimn AS (SELECT len(embedding) AS d FROM '{SRC}/embeddings.parquet' LIMIT 1),
  perm AS (
    SELECT c, list(j ORDER BY hash(j*2654435761 + c*40503), j) AS p
    FROM (SELECT unnest(range(1, d + 1)) AS j FROM dimn), copies
    GROUP BY c)
  SELECT vec_id + c*{SHIFT} AS vec_id,
         CASE WHEN c = 0 THEN embedding ELSE
           list_transform(p, j -> embedding[j::INT] *
             (CASE WHEN hash(j*31 + c*7) % 2 = 0 THEN 1.0 ELSE -1.0 END))::FLOAT[]
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet' CROSS JOIN perm""")

print("done ->", DST)
