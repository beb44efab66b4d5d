"""Deterministic scale-factor data generator for benchmark scale points the
driver does not ship (TESTDATA.md provides sf0.001/0.01/0.1; the round-4
review asked for an sf1 bench so the per-job floor amortizes and the <=2x
bar is met rather than excused).

Mirrors the driver testdata's schemas and value distributions exactly
(measured from /root/testdata/sf0.1 — see the constants below); row counts
scale linearly with sf (sf0.1 == the driver's sf0.1 sizes). Seeded numpy:
same sf -> byte-identical tables. Output is for PERFORMANCE measurement
(both engines read the same files); driver correctness stays on the
read-only driver testdata.

Usage: python harness/gen_sf.py [sf] [outdir]
       (defaults: sf=1.0, outdir=/root/repo/testdata_sf1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["large", "hot", "blue", "small", "red", "green", "dim", "shiny"]
P_NOUN = ["ring", "bolt", "washer", "nut", "gear", "cog", "pin", "plate"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
DOC_VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data a vector join scale shuffle"
).split()
DOC_LANGS = ["en", "zh", "es", "fr", "de"]
DOC_LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table,
        os.path.join(outdir, f"{name}.parquet"),
        row_group_size=1 << 20,
        compression="snappy",
    )
    print(f"  {name}: {table.num_rows} rows")


def _ts_days(rng, n, span_days=2400):
    days = rng.integers(0, span_days, n)
    return (EPOCH_1995 + days.astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def generate(sf: float, outdir: str, seed: int = 20260814) -> None:
    os.makedirs(outdir, exist_ok=True)
    m = sf / 0.1  # row multiplier relative to the measured sf0.1 shapes
    rng = np.random.default_rng(seed)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(15000 * m)
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))

    n_supp = int(1000 * m)
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    n_part = int(20000 * m)
    adj = rng.integers(0, len(P_ADJ), n_part)
    noun = rng.integers(0, len(P_NOUN), n_part)
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{P_ADJ[a]} {P_NOUN[b]}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 999.99, n_part), 2),
    }))

    n_ord = int(150000 * m)
    okeys = np.arange(n_ord)
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(okeys, pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": _ts_days(rng, n_ord),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    # lineitem: 1-7 lines per order (avg ~4, matching the driver's shape)
    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(okeys, lines_per)
    n_li = len(l_orderkey)
    l_linenumber = np.concatenate([np.arange(1, c + 1) for c in lines_per])
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(rng.uniform(900.0, 105000.0, n_li), 2)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": pa.array(
            np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _ts_days(rng, n_li),
    }))

    n_ev = int(100000 * m)
    us = rng.integers(0, 30 * 86400 * 10**6, n_ev)
    us.sort()
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": EPOCH_2024 + us.astype("timedelta64[us]"),
        "user_id": pa.array(
            rng.integers(0, int(1500 * m), n_ev), pa.int64()
        ),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
        ),
        "value": np.round(rng.exponential(80.0, n_ev).clip(0, 560.21), 2),
        "props": [
            json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)
        ],
    }))

    n_doc = int(5000 * m)
    vocab = np.array(DOC_VOCAB)
    lang_idx = rng.choice(5, n_doc, p=DOC_LANG_W)
    texts: list[str] = []
    for i in range(n_doc):
        nw = int(rng.integers(15, 61))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), nw)]))
    # ~0.2% exact duplicates (driver sf0.1 has 8/5000)
    for i in range(0, n_doc, 500):
        if i + 1 < n_doc:
            texts[i + 1] = texts[i]
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(DOC_LANGS)[lang_idx]),
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_emb = int(2000 * m)
    vecs = rng.normal(0.0, 0.08, (n_emb, 64)).astype(np.float32)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    print(f"generating sf={sf} -> {outdir}")
    generate(sf, outdir)
