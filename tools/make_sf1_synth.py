#!/usr/bin/env python3
"""Build the sf1-synth decade-sweep dataset: a 10x shard-composition of
sf0.1 (PLANS.md "Empirical scaling sweep").

Shard rules (shard 0 = the original sf0.1 rows):
- every table-local key is shifted by shard * 10_000_000, consistently
  across referencing tables (orders.o_custkey moves with customer, etc.);
  fixed-size dims (nation, region) are NOT sharded;
- document texts get 24 shard-unique suffix tokens so cross-shard copies
  fall below every near-dup threshold (distinct-token sets are <= 31 per
  doc in this corpus, so cross-shard Jaccard <= 31/(31+48) ~ 0.39 < 0.5);
- customer names get a 2-char shard tag (" qaa".." qjj") so cross-shard
  copies sit at Levenshtein 2 — invisible to x23's distance-1 join;
- embeddings rotate components by shard so cross-shard cosine is
  decorrelated; labels are kept, which is exactly the regime s8's
  adaptive cell split must absorb (10x occupancy per label).

Usage: python3 tools/make_sf1_synth.py [outdir=/tmp/sf1s] [src=/root/testdata/sf0.1] [shards=10]

With shards=100 this builds the sf10-synth corpus (the second decade of
the sweep). The shard-uniqueness devices generalize:
- customer tags become 3 chars with a mod-10 checksum digit, so any two
  tags differ in >= 2 positions (a [3,2,2]_10 MDS code) — still
  invisible to x23's distance-1 join;
- embeddings rotate by (shard mod 64) and NEGATE every component for
  shard >= 64: a plain rotation collides at shard 64 (rotation by the
  full 64-dim width is the identity, making shard-64 vectors exact
  copies of shard 0 and poisoning the near-dup queries with
  cross-shard cos=1 pairs); the global sign flip preserves all
  within-shard pairwise cosines while pushing the (s, s+64) self-pairs
  to cos=-1.
"""
import sys
from pathlib import Path

import duckdb

OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1s")
SRC = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
K = 10_000_000
SHARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
assert SHARDS <= 100, "tag code and key shifts sized for <= 100 shards"

OUT.mkdir(parents=True, exist_ok=True)
con = duckdb.connect()


def build(table, select_body):
    """select_body is a SELECT list over `t`; placeholders: `{s}` = shard
    id, `{tag}` = distance-2 customer tag, `{rot}`/`{sign}` = embedding
    rotation and sign for this shard."""
    parts = " UNION ALL ".join(
        f"SELECT {select_body.format(s=s, tag=ctag(s), rot=s % 64, sign=1 if s < 64 else -1)} "
        f"FROM '{SRC}/{table}.parquet' t"
        for s in range(SHARDS))
    con.execute(f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


TAG = "abcdefghij"


def ctag(s):
    """Shard tag with pairwise Hamming distance >= 2 (checksum digit)."""
    a, b = s // 10, s % 10
    return TAG[a] + TAG[b] + TAG[(a + b) % 10]

DOCTOK = " ".join(f"zq{{s}}w{i}" for i in range(24))

build("customer",
      "t.c_custkey + {s}*" + str(K) + " AS c_custkey, "
      "CASE WHEN {s} = 0 THEN t.c_name ELSE t.c_name || ' q{tag}' END"
      " AS c_name, "
      "t.c_nationkey, t.c_acctbal, t.c_mktsegment")
build("orders",
      f"t.o_orderkey + {{s}}*{K} AS o_orderkey, t.o_custkey + {{s}}*{K} AS o_custkey, "
      "t.o_orderstatus, t.o_totalprice, t.o_orderdate, t.o_orderpriority")
build("lineitem",
      f"t.l_orderkey + {{s}}*{K} AS l_orderkey, t.l_partkey + {{s}}*{K} AS l_partkey, "
      f"t.l_suppkey + {{s}}*{K} AS l_suppkey, t.l_linenumber, t.l_quantity, "
      "t.l_extendedprice, t.l_discount, t.l_tax, t.l_returnflag, t.l_linestatus, t.l_shipdate")
build("part",
      f"t.p_partkey + {{s}}*{K} AS p_partkey, t.p_name, t.p_brand, t.p_type, "
      "t.p_size, t.p_retailprice")
build("supplier",
      f"t.s_suppkey + {{s}}*{K} AS s_suppkey, t.s_name, t.s_nationkey, t.s_acctbal")
build("events",
      f"t.event_id + {{s}}*{K} AS event_id, t.ts, t.user_id + {{s}}*{K} AS user_id, "
      "t.event_type, t.value, t.props")
# n_chars is recomputed as len(text) for sharded copies (the suffix
# tokens change the length): queries deriving stats from `text` and
# queries reading `n_chars` must agree about document size, or the sweep
# silently measures two different corpora.
build("documents",
      f"t.doc_id + {{s}}*{K} AS doc_id, "
      "CASE WHEN {s} = 0 THEN t.text ELSE t.text || ' " + DOCTOK + "' END AS text, "
      "t.lang, t.source, "
      "CASE WHEN {s} = 0 THEN t.n_chars "
      "ELSE t.n_chars + len(' " + DOCTOK + "') END AS n_chars")
build("embeddings",
      f"t.vec_id + {{s}}*{K} AS vec_id, "
      "list_transform(t.embedding[{rot}+1:] || t.embedding[:{rot}], "
      "x -> x * {sign})::FLOAT[] AS embedding, t.label")

for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")
print("done:", OUT)
