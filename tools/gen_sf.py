"""Full-directory scale-factor generator for the sf1 rehearsal (judge
ask r8→r9 #1).

The driver fixtures stop at sf0.1 (TESTDATA.md, read-only), so the sf1
evidence needs locally generated tables. This generator reproduces the
MEASURED distributions of `/root/testdata/sf0.1` (profiled with DuckDB
in round 9 — schemas, key ranges, category sets, and the generative
laws the stats identify) at an arbitrary scale factor:

- region/nation: fixed 5/25 rows, same names/keys at every sf.
- customer: 150k·sf rows, ``Customer#%09d``, nationkey U{0..24},
  acctbal U(-1000, 10000), 5 market segments.
- supplier: 10k·sf rows, same law as customer's balance.
- part: 200k·sf rows, two-word names over the fixtures' small noun/adj
  pools, Brand#1..25, 6 types, size U{1..50},
  retailprice = 900 + (partkey % 1000)·0.1 (the fixtures' exact law).
- orders: 1.5M·sf rows, custkey uniform, status O/P/F, totalprice
  U(1000, 500000), orderdate uniform over the 2405 days
  1995-01-01..2001-08-01 (every day populated, day granularity).
- lineitem: 6M·sf rows, orderkey UNIFORM over orders (⇒ per-order
  counts Poisson(4) and ~1.8% orders childless — both match the
  fixtures), partkey/suppkey uniform, linenumber U{1..7}, quantity
  U{1..50}, discount U{0,0.01..0.1}, tax U{0,0.01..0.08},
  shipdate = its order's orderdate + U{1..95} days (fixtures: min
  1995-01-02, max = orders' max + 95).
- events: 1M·sf rows over 15k·sf users, ts uniform over 2024-01,
  value Exponential(mean 50) (fixtures: mean 50.1, median 34.7 =
  50·ln 2), props = '{"k": <0..99>}'.
- documents: 50k·sf rows via tools/gen_scale.py — the SAME generator
  every committed scale decade (BASELINE.md appendix) used, so sf1
  dedup walls chain onto the existing 20k/50k/200k evidence. Note its
  dup/near-dup injection rates are deliberate (8%/4%/8%) where the
  driver fixtures carry a lighter mix — ratios at sf1 are read
  against the sf0.1 run of the SAME generator, not the driver files.
- embeddings: 20k·sf rows, 64-dim L2-normalized cluster-structured
  vectors, 10 labels (fixtures: unit norms, ~uniform labels).

Everything is seeded and written in bounded row groups so Spark gets
real splits. Usage: ``python tools/gen_sf.py OUT_DIR SF [SEED]``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
SEGMENTS = ("AUTOMOBILE", "MACHINERY", "FURNITURE", "HOUSEHOLD", "BUILDING")
STATUSES = ("O", "P", "F")
PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
RETURNFLAGS = ("R", "N", "A")
LINESTATUSES = ("O", "F")
PTYPES = ("ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD")
PADJ = ("large", "hot", "blue", "small", "red", "green", "dim", "shiny")
PNOUN = ("ring", "bolt", "washer", "nut", "gear", "cam", "rod", "pin")
EVENT_TYPES = ("signup", "click", "purchase", "error", "view")

ORDERDATE_START = np.datetime64("1995-01-01")
ORDERDATE_DAYS = 2405  # ..2001-08-01 inclusive, every day populated
EVENTS_START = np.datetime64("2024-01-01T00:00:00")
EVENTS_SPAN_S = 30 * 24 * 3600

#: sf1 row counts (scale linearly with sf).
BASE = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "users": 15_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

ROW_GROUP = 200_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table,
        os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=ROW_GROUP,
    )
    print(f"  {name}: {table.num_rows} rows")


def generate(out_dir: str, sf: float, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = {k: max(1, int(v * sf)) for k, v in BASE.items()}

    _write(
        out_dir,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(REGIONS, pa.string()),
            }
        ),
    )
    _write(
        out_dir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    nc = n["customer"]
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(nc)]),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, nc).astype(np.int32)
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10000, nc), 2)
                ),
                "c_mktsegment": pa.array(
                    [SEGMENTS[i] for i in rng.integers(0, 5, nc)]
                ),
            }
        ),
    )

    ns = n["supplier"]
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(ns, dtype=np.int64)),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(ns)]),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, ns).astype(np.int32)
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10000, ns), 2)
                ),
            }
        ),
    )

    npart = n["part"]
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(npart, dtype=np.int64)),
                "p_name": pa.array(
                    [
                        f"{PADJ[a]} {PNOUN[b]}"
                        for a, b in zip(
                            rng.integers(0, len(PADJ), npart),
                            rng.integers(0, len(PNOUN), npart),
                        )
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(1, 26, npart)]
                ),
                "p_type": pa.array(
                    [PTYPES[i] for i in rng.integers(0, len(PTYPES), npart)]
                ),
                "p_size": pa.array(rng.integers(1, 51, npart).astype(np.int32)),
                "p_retailprice": pa.array(
                    900.0 + (np.arange(npart) % 1000) * 0.1
                ),
            }
        ),
    )

    no = n["orders"]
    o_days = rng.integers(0, ORDERDATE_DAYS, no)
    o_dates = ORDERDATE_START + o_days.astype("timedelta64[D]")
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
                "o_custkey": pa.array(
                    rng.integers(0, nc, no).astype(np.int64)
                ),
                "o_orderstatus": pa.array(
                    [STATUSES[i] for i in rng.integers(0, 3, no)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000, 500000, no), 2)
                ),
                "o_orderdate": pa.array(o_dates.astype("datetime64[us]")),
                "o_orderpriority": pa.array(
                    [PRIORITIES[i] for i in rng.integers(0, 5, no)]
                ),
            }
        ),
    )

    nl = n["lineitem"]
    l_orderkey = rng.integers(0, no, nl).astype(np.int64)
    ship = (
        o_dates[l_orderkey]
        + rng.integers(1, 96, nl).astype("timedelta64[D]")
    )
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey),
                "l_partkey": pa.array(
                    rng.integers(0, npart, nl).astype(np.int64)
                ),
                "l_suppkey": pa.array(rng.integers(0, ns, nl).astype(np.int64)),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, nl).astype(np.int32)
                ),
                "l_quantity": pa.array(
                    rng.integers(1, 51, nl).astype(np.float64)
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900, 100000, nl), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, nl) * 0.01, 2)
                ),
                "l_tax": pa.array(np.round(rng.integers(0, 9, nl) * 0.01, 2)),
                "l_returnflag": pa.array(
                    [RETURNFLAGS[i] for i in rng.integers(0, 3, nl)]
                ),
                "l_linestatus": pa.array(
                    [LINESTATUSES[i] for i in rng.integers(0, 2, nl)]
                ),
                "l_shipdate": pa.array(ship.astype("datetime64[us]")),
            }
        ),
    )

    ne = n["events"]
    ts = EVENTS_START + (
        rng.uniform(0, EVENTS_SPAN_S, ne) * 1e6
    ).astype("timedelta64[us]")
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(ne, dtype=np.int64)),
                "ts": pa.array(np.sort(ts).astype("datetime64[us]")),
                "user_id": pa.array(
                    rng.integers(0, n["users"], ne).astype(np.int64)
                ),
                "event_type": pa.array(
                    [EVENT_TYPES[i] for i in rng.integers(0, 5, ne)]
                ),
                "value": pa.array(np.round(rng.exponential(50.0, ne), 2)),
                "props": pa.array(
                    [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, ne)]
                ),
            }
        ),
    )

    from tools.gen_scale import write_documents

    write_documents(out_dir, n["documents"], seed=1_234)
    print(f"  documents: {n['documents']} rows (gen_scale)")

    nv = n["embeddings"]
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, nv)
    vecs = centers[labels] + rng.normal(0, 0.35, (nv, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
                "embedding": pa.array(
                    [v for v in vecs.astype(np.float32)],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels.astype(np.int32)),
            }
        ),
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    print(f"generating sf={sf} -> {out}")
    generate(out, sf, seed)
