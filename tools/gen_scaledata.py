"""Generate sf1 (10x bench scale) synthetic tables for scale-slope measurement.

The driver's testdata (/root/testdata/sf{0.001,0.01,0.1}) is read-only and
tops out at sf0.1 (~600k lineitem rows). VERDICT r7 item #1 asks for measured
evidence that the engine's plans scale ~linearly, which needs a 10x dataset.
This script regenerates the same star schema at sf1 with matching column
names, types, value domains, and key cardinalities (profiled from sf0.1 with
DuckDB; see SCALE.md). It does NOT reproduce the driver's exact rows (seed
unknown) — slope measurement only needs statistically-similar data, and
correctness remains graded on the driver's own sf0.01.

Deterministic: numpy PCG64(seed=42) per table. Writes multi-row-group parquet
(~512k rows/group) so Spark's scan parallelism at sf1 matches a real
multi-file layout.

Usage: python tools/gen_scaledata.py [--sf 1.0] [--out /tmp/scaledata/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Value domains profiled from /root/testdata/sf0.1 (DuckDB, 2026-08-15).
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
N_NATIONS = 25
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
PART_ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "dim"]
PART_NOUN = ["ring", "bolt", "screw", "washer", "nut", "pin", "rod", "cap"]
PART_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
DOC_LANGS = ["en", "de", "es", "fr", "zh"]
DOC_LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]

ROW_GROUP = 512 * 1024


def _rng(name: str) -> np.random.Generator:
    # zlib.crc32, not hash(): str hash is salted per-process, crc32 is stable.
    import zlib

    return np.random.Generator(np.random.PCG64(zlib.crc32(f"sf-scale:{name}".encode()) + 42))


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=ROW_GROUP)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts(days_f: np.ndarray, base: str) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    return pa.array(base_us + (days_f * 86400_000_000).astype("int64"), type=pa.timestamp("us"))


def generate(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(N_NATIONS), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(N_NATIONS)],
        "n_regionkey": pa.array([i % 5 for i in range(N_NATIONS)], pa.int32()),
    }))

    g = _rng("customer")
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(g.integers(0, N_NATIONS, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(g.uniform(-1000.0, 10_000.0, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[g.integers(0, 5, n_cust)]),
    }))

    g = _rng("supplier")
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(g.integers(0, N_NATIONS, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(g.uniform(-1000.0, 10_000.0, n_supp), 2)),
    }))

    g = _rng("part")
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([
            f"{PART_ADJ[a]} {PART_NOUN[b]}"
            for a, b in zip(g.integers(0, len(PART_ADJ), n_part),
                            g.integers(0, len(PART_NOUN), n_part))
        ]),
        "p_brand": pa.array([f"Brand#{i}" for i in g.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PART_TYPES)[g.integers(0, len(PART_TYPES), n_part)]),
        "p_size": pa.array(g.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(g.uniform(900.0, 999.9, n_part), 2)),
    }))

    g = _rng("orders")
    # orderdate spans 1995-01-01 .. 2001-08-01 (~2404 days), like sf0.1
    odays = g.uniform(0, 2404, n_ord)
    odates_us = (np.datetime64("1995-01-01", "us").astype("int64")
                 + (odays.astype("int64")) * 86400_000_000)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(g.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(np.array(STATUSES)[g.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(g.uniform(1000.0, 500_000.0, n_ord), 2)),
        "o_orderdate": pa.array(odates_us, type=pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[g.integers(0, 5, n_ord)]),
    }))

    g = _rng("lineitem")
    # 1..7 lines per order, mean ~4 (profiled 4.08 at sf0.1)
    per_order = g.integers(1, 8, n_ord)
    n_li = int(per_order.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    linenumber = (np.arange(n_li, dtype=np.int64)
                  - np.repeat(np.cumsum(per_order) - per_order, per_order) + 1)
    # shipdate = orderdate + 1..95 days
    ship_us = (np.repeat(odates_us, per_order)
               + g.integers(1, 96, n_li) * 86400_000_000)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(g.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(g.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(linenumber.astype(np.int32)),
        "l_quantity": pa.array(g.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(g.uniform(900.0, 50_000.0, n_li), 2)),
        "l_discount": pa.array(np.round(g.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(g.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(np.array(RETURNFLAGS)[g.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(LINESTATUSES)[g.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship_us, type=pa.timestamp("us")),
    }))

    g = _rng("events")
    n_users = int(15_000 * sf) if sf >= 1 else 1500
    ts_us = (np.datetime64("2024-01-01", "us").astype("int64")
             + g.integers(0, 30 * 86400_000_000, n_events))
    ts_us.sort()
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(ts_us, type=pa.timestamp("us")),
        "user_id": pa.array(g.integers(0, n_users, n_events)),
        "event_type": pa.array(np.array(EVENT_TYPES)[g.integers(0, 5, n_events)]),
        "value": pa.array(np.round(g.exponential(50.0, n_events).clip(0, 600), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in g.integers(0, 100, n_events)]),
    }))

    g = _rng("documents")
    vocab = np.array(DOC_VOCAB)
    lengths = g.integers(10, 101, n_docs)
    words = vocab[g.integers(0, len(vocab), int(lengths.sum()))]
    offs = np.concatenate(([0], np.cumsum(lengths)))
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    # plant ~0.2% exact duplicates like sf0.1 (4992 distinct of 5000)
    dup_idx = g.choice(n_docs, size=max(1, n_docs // 500), replace=False)
    for i in dup_idx:
        texts[i] = texts[int(g.integers(0, n_docs))]
    langs = g.choice(DOC_LANGS, size=n_docs, p=DOC_LANG_W)
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{i}" for i in g.integers(0, 20, n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    g = _rng("embeddings")
    emb = g.normal(0, 1, (n_emb, 64)).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": pa.array(g.integers(0, 10, n_emb).astype(np.int32)),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/scaledata/sf1")
    a = ap.parse_args()
    print(f"generating sf={a.sf} -> {a.out}")
    generate(a.sf, a.out)
    print("done")
