"""Generate an sf1-equivalent (10× bench-scale) dataset from the
driver's read-only sf0.1 parquet, for the measured scale sweep
(round-8 verdict task 3: convert the 100×-design story from plan
invariants into numbers).

Scaling model: 10 key-shifted replicas of every scalable table —
the realistic axis for this engine (more users/orders/docs, same time
range, so per-(type, day) partitions get 10× deeper and shuffles carry
10× the rows). Replica 0 is the original data verbatim.

- Fact/dim keys shift by ``i * OFFSET`` so replicas never collide.
- ``documents.text`` gets a per-replica token suffix (replica i != 0
  rewrites every token ``w -> w<i>``): each replica is an isomorphic
  shard with DISJOINT vocabulary, so near-dup/minhash workloads see a
  10× corpus with the original within-shard duplicate structure, not
  10 exact copies of every document (which would quadratically inflate
  candidate pairs and measure a degeneracy, not scaling).
- ``embeddings.embedding`` gets small deterministic per-replica noise
  so similarity top-k at sf1 ranks 10× real candidates instead of
  10-way exact ties.
- ``region``/``nation`` stay as-is (fixed dims, as in TPC-H).

Usage: ``python tools/sf1_gen.py [out_dir]`` (default ``/tmp/sf1``).
DuckDB does the replication — fast, and the output parquet reads back
through the same ``registry.load`` path the queries use.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFFSET = 100_000_000  # far above any sf0.1 key; replica i shifts by i*OFFSET
REPLICAS = 10  # default: sf1-equivalent; pass e.g. 100 for sf10

# table -> key columns to shift per replica
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def _replica_select(table: str, cols: list[tuple[str, str]]) -> str:
    """SELECT list for one replicated table; r.i is the replica index."""
    shifts = set(KEY_SHIFTS[table])
    parts = []
    for name, _ in cols:
        if name in shifts:
            parts.append(f"{name} + r.i * {OFFSET} AS {name}")
        elif table == "documents" and name == "text":
            # replica 0 verbatim; else suffix every token with the
            # replica digit -> disjoint vocab, isomorphic shingle sets
            parts.append(
                "CASE WHEN r.i = 0 THEN text ELSE regexp_replace("
                "text, '([A-Za-z0-9]+)', '\\1' || CAST(r.i AS VARCHAR), 'g') "
                "END AS text"
            )
        elif table == "documents" and name == "n_chars":
            parts.append(
                "CASE WHEN r.i = 0 THEN n_chars ELSE CAST(length("
                "regexp_replace(text, '([A-Za-z0-9]+)', '\\1' || "
                "CAST(r.i AS VARCHAR), 'g')) AS BIGINT) END AS n_chars"
            )
        elif table == "embeddings" and name == "embedding":
            # deterministic, element-dependent noise; keeps replica 0 exact
            parts.append(
                "CAST(list_transform(embedding, x -> x + 0.02 * r.i * "
                "sin(x * 117.0 + r.i)) AS FLOAT[]) AS embedding"
            )
        else:
            parts.append(name)
    return ", ".join(parts)


def generate(out_dir: str, replicas: int = REPLICAS) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied as-is")
    for t in KEY_SHIFTS:
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()
        sel = _replica_select(t, [(c[0], c[1]) for c in cols])
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"range({replicas}) AS r(i)) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({replicas} replicas)")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else REPLICAS
    generate(out, reps)
