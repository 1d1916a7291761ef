#!/usr/bin/env python3
"""Deterministic scale-up fixture generator (tools-side, like selfcheck.py).

Replicates a fixture directory R x with remapped keys: replica r shifts every
key column by r * stride(table), where stride = max(key) + 1 of the source.
Foreign keys shift by the SAME stride as the table they reference, so each
replica is a self-contained shard of the original graph - exactly how a
sharded production corpus grows. region/nation are fixed dimensions and are
copied as-is. Timestamps are left untouched (10x density in the same window =
load growth, which is what a scale test should stress). No RNG anywhere:
byte-deterministic output.

pyarrow (not Spark) so every physical parquet type survives the round-trip
byte-identically - the loader (Tables.scala) branches on the events table's
physical timestamp layout (ns-as-long vs native us), and the oracle compare
depends on the scaled fixtures carrying exactly the source generation's
types. Works unchanged for both fixture generations: the schema is copied,
and arithmetic touches only int64 key columns.

Usage: scalegen.py <srcDir> <dstDir> <R>
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# key columns per table -> which stride domain they belong to
KEYMAP = {
    "customer":   {"c_custkey": "cust"},
    "supplier":   {"s_suppkey": "supp"},
    "part":       {"p_partkey": "part"},
    "orders":     {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem":   {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events":     {"event_id": "evt", "user_id": "cust"},
    "documents":  {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

STRIDE_SRC = {  # domain -> (table, column) that defines its stride
    "cust": ("customer", "c_custkey"), "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),     "ord": ("orders", "o_orderkey"),
    "evt": ("events", "event_id"),     "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def main(src: str, dst: str, rep: int, salt_docs: bool = False) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    strides = {}
    for dom, (tbl, colname) in STRIDE_SRC.items():
        col = pq.read_table(f"{src}/{tbl}.parquet", columns=[colname])[colname]
        strides[dom] = pc.max(col).as_py() + 1
    print("strides:", strides)
    for tbl in TABLES:
        t = pq.read_table(f"{src}/{tbl}.parquet")
        # strip pandas metadata; irrelevant and bloats the copies
        t = t.replace_schema_metadata(None)
        if tbl not in KEYMAP:  # fixed dimension: copy once
            pq.write_table(t, f"{dst}/{tbl}.parquet")
            print(f"{tbl}: copied {t.num_rows} rows (fixed dim)")
            continue
        reps = []
        for r in range(rep):
            if r == 0:
                reps.append(t)
                continue
            cols = []
            for name in t.schema.names:
                col = t[name]
                dom = KEYMAP[tbl].get(name)
                if dom is not None:
                    col = pc.add(col, pa.scalar(r * strides[dom], type=col.type))
                # --salt-docs: replica r's documents get every token RENAMED
                # with a per-shard suffix (tok -> tok_r), so each replica is a
                # DISTINCT shard of the corpus. Plain replication copies text
                # verbatim, which gives every doc rep-1 exact clones —
                # duplicate DENSITY grows with SF (measured: prefix-40
                # intra-block candidate pairs 256 -> 27.3M from sf0.1 -> sf10,
                # a 10^5x blowup for 100x data) — unphysical for a corpus that
                # grows by ingesting new shards. A PREPENDED tag is not
                # enough: it de-clones the prefix-40 blocking key but leaves
                # cross-shard docs sharing ~97% of their shingles, so a
                # LOSSLESS set-similarity join (g53) still faces quadratic
                # candidates and must output every cross-shard clone pair.
                # The bijective token rename preserves all within-shard
                # set-similarity values EXACTLY (it is a bijection on the
                # token alphabet) and drives cross-shard n-gram overlap to
                # zero -> candidate growth is linear in rep, which is what a
                # scale gate should measure.
                if salt_docs and tbl == "documents" and name == "text":
                    suffix = f"_{r}"
                    col = pa.chunked_array([pa.array(
                        [None if s is None else
                         " ".join(tok + suffix for tok in s.split(" "))
                         for s in col.to_pylist()], type=pa.string())])
                cols.append(col)
            reps.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(reps)
        # row groups sized so every table yields >= ~64 scan splits: a
        # production table of this size is many files/row-groups, and a
        # single-row-group parquet serializes the whole scan onto one core
        # (measured: g68's 200k-row pool in ONE row group ran its broadcast
        # scoring single-threaded)
        pq.write_table(out, f"{dst}/{tbl}.parquet",
                       row_group_size=max(4096, out.num_rows // 64))
        print(f"{tbl}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--salt-docs"]
    main(args[0], args[1], int(args[2]), salt_docs="--salt-docs" in sys.argv)
