#!/usr/bin/env python
"""Generate an sf1.0 fixture tier for the scale rehearsal (r9 judge
item 2).

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md, read-only), so the
one-shot sf1.0 rehearsal needs its own generation. This script emits the
same ten tables with the same parquet schemas (verified field-by-field
against the sf0.1 footers) and the same value domains/distributions
(measured from sf0.1 — see the constants below), scaled 10x from sf0.1:

    lineitem 6M, orders 1.5M, events 1M, customer 150k, part 200k,
    supplier 10k, documents 50k, embeddings 20k, nation 25, region 5.

Correctness at sf1.0 does NOT depend on matching the driver's exact
generator — the DuckDB oracle runs on the SAME files — but the domains
match so selectivities, group cardinalities, join fan-outs, and text/
embedding shapes stay representative of the driver tiers.

Deterministic: numpy PCG64 seeded 42. Output dir: $SPARK_GRAFT_SF1_DIR
(default /root/repo/.testdata/sf1.0 — gitignored; ~200 MB).

Measured sf0.1 facts this reproduces at 10x:
- orders: keys sequential, custkey uniform, status F/O/P + 5 priorities
  uniform, totalprice unif(1000, 500000) 2dp, orderdate = midnight days
  unif over 1995-01-01..2001-08-01.
- lineitem: lines-per-order ~ Poisson(4) INCLUDING zeros (~1.8% of
  orders have no lineitems at sf0.1), quantity integer 1..50 as double,
  extendedprice unif(900, 105000) 2dp independent of quantity, discount
  k/100 for k in 0..10, tax k/100 for k in 0..8, returnflag A/N/R,
  linestatus F/O, shipdate independent of orderdate, unif over
  1995-01-02..2001-11-04.
- events: ts sorted over a 30-day Jan-2024 window (exponential gaps),
  user_id unif over customer_count/10 users, 5 types uniform, value ~
  Exp(mean 50) 2dp, props = '{"k": <0..99>}'.
- documents: 10..100 tokens uniform from the 30-word sf0.1 vocab, 5% of
  docs get one token replaced by the 'dup' marker, source = src{id%20},
  lang weights {en .41, de .14, es .15, fr .148, zh .15}, n_chars =
  len(text); 0.32% of docs are EXACT duplicates of an earlier doc
  (8 pairs per 5000 docs at sf0.1 -> 80 pairs here).
- embeddings: 64-dim float32 unit vectors (normal/normalize), label
  unif 0..9, no label clustering (measured within==cross cosine ~ 0).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.testdata/sf1.0")
SEED = 42

N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000
N_DOCUMENTS = 50_000
N_EMBEDDINGS = 20_000
EMB_DIM = 64

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.148, 0.152]

EPOCH_1995 = np.datetime64("1995-01-01")
ORDERDATE_DAYS = int(
    (np.datetime64("2001-08-01") - EPOCH_1995) / np.timedelta64(1, "D")
)
SHIP_LO = np.datetime64("1995-01-02")
SHIP_DAYS = int((np.datetime64("2001-11-04") - SHIP_LO) / np.timedelta64(1, "D"))


def _ts_us(days: np.ndarray, base: np.datetime64) -> pa.Array:
    vals = (base + days.astype("timedelta64[D]")).astype("datetime64[us]")
    return pa.array(vals, type=pa.timestamp("us"))


def _money(rng, n, lo, hi) -> np.ndarray:
    return np.round(rng.uniform(lo, hi, n), 2)


def write(name: str, table: pa.Table) -> None:
    path = os.path.join(OUT_DIR, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"{name}: {table.num_rows} rows -> {path}", flush=True)


def gen_dims(rng) -> None:
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), type=pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), type=pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
            }
        ),
    )
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(N_CUSTOMER, dtype=np.int64)),
                "c_name": [f"Customer#{i:09d}" for i in range(N_CUSTOMER)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, N_CUSTOMER, dtype=np.int32), type=pa.int32()
                ),
                "c_acctbal": _money(rng, N_CUSTOMER, -1000, 10000),
                "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, N_CUSTOMER)],
            }
        ),
    )
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(N_SUPPLIER, dtype=np.int64)),
                "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPPLIER)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, N_SUPPLIER, dtype=np.int32), type=pa.int32()
                ),
                "s_acctbal": _money(rng, N_SUPPLIER, -1000, 10000),
            }
        ),
    )
    adj = rng.integers(0, 8, N_PART)
    noun = rng.integers(0, 8, N_PART)
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(N_PART, dtype=np.int64)),
                "p_name": [f"{ADJS[a]} {NOUNS[b]}" for a, b in zip(adj, noun)],
                "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, N_PART)],
                "p_type": [TYPES[i] for i in rng.integers(0, 6, N_PART)],
                "p_size": pa.array(
                    rng.integers(1, 51, N_PART, dtype=np.int32), type=pa.int32()
                ),
                "p_retailprice": _money(rng, N_PART, 900, 999.9),
            }
        ),
    )


def gen_orders(rng) -> np.ndarray:
    days = rng.integers(0, ORDERDATE_DAYS + 1, N_ORDERS)
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(N_ORDERS, dtype=np.int64)),
                "o_custkey": pa.array(
                    rng.integers(0, N_CUSTOMER, N_ORDERS, dtype=np.int64)
                ),
                "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, N_ORDERS)],
                "o_totalprice": _money(rng, N_ORDERS, 1000, 500000),
                "o_orderdate": _ts_us(days, EPOCH_1995),
                "o_orderpriority": [
                    PRIORITIES[i] for i in rng.integers(0, 5, N_ORDERS)
                ],
            }
        ),
    )
    return days


def gen_lineitem(rng) -> None:
    lines_per_order = rng.poisson(4.0, N_ORDERS)
    okeys = np.repeat(np.arange(N_ORDERS, dtype=np.int64), lines_per_order)
    n = len(okeys)
    linenumbers = np.concatenate(
        [np.arange(1, k + 1, dtype=np.int32) for k in lines_per_order if k]
    )
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(okeys),
                "l_partkey": pa.array(rng.integers(0, N_PART, n, dtype=np.int64)),
                "l_suppkey": pa.array(rng.integers(0, N_SUPPLIER, n, dtype=np.int64)),
                "l_linenumber": pa.array(linenumbers, type=pa.int32()),
                "l_quantity": rng.integers(1, 51, n).astype(np.float64),
                "l_extendedprice": _money(rng, n, 900, 105000),
                "l_discount": rng.integers(0, 11, n) / 100.0,
                "l_tax": rng.integers(0, 9, n) / 100.0,
                "l_returnflag": [("A", "N", "R")[i] for i in rng.integers(0, 3, n)],
                "l_linestatus": [("F", "O")[i] for i in rng.integers(0, 2, n)],
                "l_shipdate": _ts_us(rng.integers(0, SHIP_DAYS + 1, n), SHIP_LO),
            }
        ),
    )


def gen_events(rng) -> None:
    window_us = 30 * 24 * 3600 * 1_000_000
    gaps = rng.exponential(window_us / N_EVENTS, N_EVENTS)
    ts = np.datetime64("2024-01-01", "us") + np.cumsum(gaps).astype(
        "timedelta64[us]"
    )
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, N_CUSTOMER // 10, N_EVENTS, dtype=np.int64)
                ),
                "event_type": [
                    EVENT_TYPES[i] for i in rng.integers(0, 5, N_EVENTS)
                ],
                "value": np.round(rng.exponential(50.0, N_EVENTS), 2),
                "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)],
            }
        ),
    )


def gen_documents(rng) -> None:
    lens = rng.integers(10, 101, N_DOCUMENTS)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(N_DOCUMENTS):
        toks = vocab[rng.integers(0, len(vocab), lens[i])]
        if rng.random() < 0.05:
            toks = toks.copy()
            toks[rng.integers(0, len(toks))] = "dup"
        texts.append(" ".join(toks))
    # exact duplicates: 80 pairs (same rate as sf0.1's 8 per 5000)
    for _ in range(80):
        a, b = rng.integers(0, N_DOCUMENTS, 2)
        texts[int(a)] = texts[int(b)]
    langs = rng.choice(len(LANGS), N_DOCUMENTS, p=np.array(LANG_W) / sum(LANG_W))
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(N_DOCUMENTS, dtype=np.int64)),
                "text": texts,
                "lang": [LANGS[i] for i in langs],
                "source": [f"src{i % 20}" for i in range(N_DOCUMENTS)],
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
    )


def gen_embeddings(rng) -> None:
    mat = rng.standard_normal((N_EMBEDDINGS, EMB_DIM)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(N_EMBEDDINGS, dtype=np.int64)),
                "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
                "label": pa.array(
                    rng.integers(0, 10, N_EMBEDDINGS, dtype=np.int32),
                    type=pa.int32(),
                ),
            }
        ),
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    gen_dims(rng)
    gen_orders(rng)
    gen_lineitem(rng)
    gen_events(rng)
    gen_documents(rng)
    gen_embeddings(rng)
    total = sum(
        os.path.getsize(os.path.join(OUT_DIR, f)) for f in os.listdir(OUT_DIR)
    )
    print(f"total {total / 1e6:.1f} MB in {OUT_DIR}")


if __name__ == "__main__":
    sys.exit(main())
