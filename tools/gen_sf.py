"""Generate a larger scale factor of the testdata schema for scaling runs.

The driver ships sf0.001/0.01/0.1 read-only; measuring scaling EXPONENTS
(is any query super-linear?) needs one more decade. This generator produces
an sf1-shaped dataset — same tables, same schema, same column domains and
statistical shape as the driver data (distributions measured from sf0.1:
row-count ratios, value ranges, category sets, planted near/exact dup rate,
clustered embeddings) — deterministically from a fixed seed. It is NOT the
driver's generator and makes no byte-parity claim; it exists so bench runs
at 10x sf0.1 can compare per-query runtime growth against row growth.

Usage:  python tools/gen_sf.py /tmp/testdata_sf1/sf1 10
        (scale relative to sf0.1; 10 => ~6M lineitem rows)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242
BASE = "/root/testdata/sf0.1"  # vocabulary + category anchors

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]
PTYPES = ["LARGE", "SMALL", "ECONOMY", "STANDARD", "PROMO", "MEDIUM"]
PART_WORDS = ["large", "hot", "blue", "red", "green", "small", "shiny", "dull"]
PART_NOUNS = ["ring", "bolt", "case", "drum", "tube", "plate"]

DAY_US = 86_400_000_000


def _vocab() -> list[str]:
    """Token vocabulary measured from the driver corpus (distinct tokens of
    sf0.1 documents) so generated text exercises the same tokenizers."""
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM '{BASE}/documents.parquet' ORDER BY w"
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(base_us: int, offsets_us) -> pa.Array:
    return pa.array(
        (base_us + offsets_us).astype("int64"), type=pa.timestamp("us")
    )


def generate(outdir: str, scale: float = 10.0) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(15_000 * scale)
    n_supp = int(1_000 * scale)
    n_part = int(20_000 * scale)
    n_orders = int(150_000 * scale)
    n_events = int(100_000 * scale)
    n_docs = int(5_000 * scale)
    n_vecs = int(2_000 * scale)
    n_users = int(1_500 * scale)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype="int64")),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype("int32")),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype="int64")),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype("int32")),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype="int64")),
        "p_name": [
            f"{PART_WORDS[i % len(PART_WORDS)]} {PART_NOUNS[(i // 7) % len(PART_NOUNS)]}"
            for i in range(n_part)
        ],
        "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype("int32")),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    # orders span 1995-01-01 .. 2001-08-01 at day granularity (as measured)
    o_epoch = np.datetime64("1995-01-01", "us").astype("int64")
    o_span_days = (
        np.datetime64("2001-08-01", "us") - np.datetime64("1995-01-01", "us")
    ).astype("int64") // DAY_US
    o_days = rng.integers(0, o_span_days + 1, n_orders)
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype="int64")),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders).astype("int64")),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_orders)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
        "o_orderdate": _ts_us(o_epoch, o_days * DAY_US),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]
        ),
    }))

    per_order = rng.integers(1, 8, n_orders)  # avg ~4 lines/order
    l_orderkey = np.repeat(np.arange(n_orders, dtype="int64"), per_order)
    n_li = len(l_orderkey)
    linenum = np.concatenate([np.arange(1, k + 1) for k in per_order]).astype("int32")
    ship_days = np.repeat(o_days, per_order) + rng.integers(1, 96, n_li)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li).astype("int64")),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li).astype("int64")),
        "l_linenumber": pa.array(linenum),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us(o_epoch, ship_days * DAY_US),
    }))

    ev_epoch = np.datetime64("2024-01-01", "us").astype("int64")
    ev_off = rng.integers(0, 30 * DAY_US, n_events)
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_events, dtype="int64")),
        "ts": _ts_us(ev_epoch, ev_off),
        "user_id": pa.array(rng.integers(0, n_users, n_events).astype("int64")),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)]
        ),
        "value": np.round(rng.uniform(0, 560, n_events), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)],
    }))

    vocab = np.array(_vocab())
    texts: list[str] = []
    for i in range(n_docs):
        if i >= 100 and i % 100 == 51:
            texts.append(texts[i - 100])  # planted EXACT dup (~1%)
        elif i >= 20 and i % 20 == 7:
            toks = texts[i - 20].split(" ")  # planted NEAR dup (~5%)
            toks[int(rng.integers(0, len(toks)))] = str(
                vocab[int(rng.integers(0, len(vocab)))]
            )
            texts.append(" ".join(toks))
        else:
            k = int(rng.integers(12, 65))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype="int64")),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_docs, p=LANG_W)]),
        "source": [f"src{i % 20}" for i in range(n_docs)],
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype="int64")),
    }))

    # Driver geometry (measured at sf0.1): UNIFORM random unit vectors,
    # labels independent of geometry — within-label cosine is centred on 0
    # (p99 ≈ 0.29), so the cos ≥ 0.3 near-dup graph keeps the same pair
    # DENSITY per vector-pair (~0.8%) rather than collapsing into clusters.
    # (A clustered first attempt put within-cluster cosine at ~0.9 and blew
    # the pair table up quadratically — not what the driver data does.)
    labels = rng.integers(0, 10, n_vecs)
    vecs = rng.normal(0, 1, (n_vecs, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype("float32")
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype="int64")),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype("int32")),
    }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1/sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    generate(out, scale)
    print(f"wrote {out}")
