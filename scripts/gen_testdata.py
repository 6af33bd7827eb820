"""Generate schema-compatible synthetic testdata at an arbitrary SF — the
local extension of the driver's recipe (TESTDATA.md) for scale probes
above sf0.1 (r7 verdict task #6). /root/testdata is read-only, so larger
SFs land in a repo-local directory.

Distribution-matched to the driver tables (inspected at sf0.1): same
schemas, key ranges scaling linearly with SF, same categorical domains
and skews (en-heavy lang mix, uniform event types, unit-normalized
64-dim embeddings, 31-word corpus vocabulary with ~0.2% exact-duplicate
texts). NOT byte-identical to what the driver would generate — scale
probes compare the ENGINE's time growth across SFs, not values across
recipes, so distributional fidelity is what matters.

Usage: python scripts/gen_testdata.py SF OUTDIR [seed=42]
  e.g. python scripts/gen_testdata.py 0.3 testdata_local/sf0.3
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.15, 0.15, 0.145, 0.145]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
SEGMENTS = ["MACHINERY", "FURNITURE", "HOUSEHOLD", "BUILDING", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["LARGE", "STANDARD", "MEDIUM", "ECONOMY", "PROMO", "SMALL"]
ADJ = "large hot blue red green small shiny dull".split()
NOUN = "ring bolt nut gear cog plate rod pin".split()

# rows per SF=1.0 (10x the observed sf0.1 counts)
N_PER_SF = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}
N_USERS_PER_SF = 15_000

DAY_US = 86_400_000_000


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def main() -> None:
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = {t: max(1, int(c * sf)) for t, c in N_PER_SF.items()}
    n_users = max(1, int(N_USERS_PER_SF * sf))

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    _write(outdir, "customer", pa.table({
        "c_custkey": np.arange(nc, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    ns = n["supplier"]
    _write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(ns, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
    }))

    npart = n["part"]
    _write(outdir, "part", pa.table({
        "p_partkey": np.arange(npart, dtype=np.int64),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, npart), rng.integers(0, 8, npart))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, npart)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, npart), 2),
    }))

    no = n["orders"]
    base_1995 = np.datetime64("1995-01-01", "us").astype(np.int64)
    span_days = 2404  # 1995-01-01 .. 2001-08-01
    _write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(no, dtype=np.int64),
        "o_custkey": rng.integers(0, nc, no).astype(np.int64),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, no)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
        "o_orderdate": _ts_col(base_1995 + rng.integers(0, span_days, no) * DAY_US),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, no)]),
    }))

    nl = n["lineitem"]
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, no, nl).astype(np.int64),
        "l_partkey": rng.integers(0, npart, nl).astype(np.int64),
        "l_suppkey": rng.integers(0, ns, nl).astype(np.int64),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["R", "N", "A"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, nl)]),
        "l_shipdate": _ts_col(base_1995 + rng.integers(1, span_days + 95, nl) * DAY_US),
    }))

    ne = n["events"]
    base_2024 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ev_ts = np.sort(base_2024 + rng.integers(0, 30 * DAY_US, ne))
    _write(outdir, "events", pa.table({
        "event_id": np.arange(ne, dtype=np.int64),
        "ts": _ts_col(ev_ts),
        "user_id": rng.integers(0, n_users, ne).astype(np.int64),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(rng.exponential(80.0, ne).clip(0, 560), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, ne)],
    }))

    nd = n["documents"]
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, nd)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    # ~0.2% exact duplicates (dedup operators need a non-empty answer)
    for i in range(0, nd, 500):
        if i + 1 < nd:
            texts[i + 1] = texts[i]
    langs = np.array(LANGS)[rng.choice(5, nd, p=LANG_P)]
    _write(outdir, "documents", pa.table({
        "doc_id": np.arange(nd, dtype=np.int64),
        "text": texts,
        "lang": pa.array(langs),
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    nv = n["embeddings"]
    raw = rng.normal(0, 1, (nv, 64))
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    emb = raw.astype(np.float32)
    _write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(nv, dtype=np.int64),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, nv), pa.int32()),
    }))


if __name__ == "__main__":
    main()
