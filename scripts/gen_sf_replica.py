#!/usr/bin/env python
"""Generate a LARGER-scale replica of the driver's sf* test tables.

MEASUREMENT-ONLY. The driver generates /root/testdata/sf* itself and
treats them as read-only; larger scales (the round-5 driver measurement
escalated to sf1.0) exist only during driver runs. This script rebuilds
a statistically matched stand-in at any multiple of a source sf dir so
optimization work can be measured at driver scale between driver runs:

* documents  — i.i.d. tokens over the source vocabulary (the source
  corpus measures H(w2|w1) == H(w), i.e. no sequential structure), token
  count ~ Uniform[10,100], the rare 'dup' token at its source rate,
  exact-duplicate pairs at the source rate, lang/source marginals copied.
* embeddings — uniform random unit vectors (source within-label mean
  cosine == centroid norm == 1/sqrt(n), the zero-structure signature),
  uniform labels.
* events     — ts sorted-uniform over the source time span, users/rows
  scaled, value ~ round(Exp(mean), 2), uniform event types, props k.
* TPC-H-ish  — source tables tiled `m` times with disjoint key offsets
  (per-shard attribute distributions identical to the source).
* region/nation — copied (fixed dimensions).

Every table is written as a single-file, single-row-group parquet, the
same physical layout the driver uses (row groups are the scan-split
floor, so layout parity matters for measurement).

Usage: python scripts/gen_sf_replica.py [--src /root/testdata/sf0.1]
         [--mult 10] [--out /root/repo/_work/sfr1.0] [--seed 4242]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 100_000_000  # effectively "one row group per file"


def _write(table: pa.Table, path: Path) -> None:
    pq.write_table(table, path, row_group_size=ROW_GROUP, compression="snappy")
    print(f"wrote {path} rows={table.num_rows}")


def gen_documents(con, src: str, out: Path, m: int, rng) -> None:
    rows = con.execute(
        f"select text, lang from read_parquet('{src}/documents.parquet')"
    ).fetchall()
    n_src = len(rows)
    n = n_src * m
    from collections import Counter

    uni: Counter = Counter()
    for t, _ in rows:
        uni.update(t.split(" "))
    total = sum(uni.values())
    words = sorted(uni)
    probs = np.array([uni[w] for w in words], dtype=float) / total
    lang_counts = Counter(l for _, l in rows)
    langs = sorted(lang_counts)
    lang_p = np.array([lang_counts[l] for l in langs], dtype=float) / n_src
    dup_groups = sum(1 for c in Counter(t for t, _ in rows).values() if c > 1)
    dup_rate = dup_groups / n_src

    tok_counts = rng.integers(10, 101, size=n)
    word_arr = np.array(words, dtype=object)
    texts = []
    for i in range(n):
        toks = word_arr[rng.choice(len(words), size=tok_counts[i], p=probs)]
        texts.append(" ".join(toks))
    # exact-duplicate injection at the source rate: overwrite a few docs
    # with a copy of a random earlier doc
    n_dup = int(round(dup_rate * n))
    for j in rng.choice(np.arange(1, n), size=n_dup, replace=False):
        texts[j] = texts[rng.integers(0, j)]
    lang = np.array(langs, dtype=object)[rng.choice(len(langs), size=n, p=lang_p)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    _write(tbl, out / "documents.parquet")


def gen_embeddings(con, src: str, out: Path, m: int, rng) -> None:
    n_src, dim, n_labels = con.execute(
        f"select count(*), max(len(embedding)), count(distinct label) "
        f"from read_parquet('{src}/embeddings.parquet')"
    ).fetchone()
    n = n_src * m
    g = rng.standard_normal((n, dim)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(g), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, n_labels, size=n, dtype=np.int32), pa.int32()
            ),
        }
    )
    _write(tbl, out / "embeddings.parquet")


def gen_events(con, src: str, out: Path, m: int, rng) -> None:
    n_src, users_src, lo, hi, vmean = con.execute(
        f"select count(*), count(distinct user_id), min(ts), max(ts), avg(value) "
        f"from read_parquet('{src}/events.parquet')"
    ).fetchone()
    n, users = n_src * m, users_src * m
    span = (hi - lo).total_seconds()
    offs = np.sort(rng.uniform(0, span, size=n))
    ts = (np.datetime64(lo, "us") + (offs * 1e6).astype("timedelta64[us]"))
    etypes = np.array(["signup", "click", "error", "view", "purchase"], dtype=object)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, users, size=n, dtype=np.int64), pa.int64()
            ),
            "event_type": pa.array(
                etypes[rng.integers(0, len(etypes), size=n)], pa.string()
            ),
            "value": pa.array(
                np.round(rng.exponential(vmean, size=n), 2), pa.float64()
            ),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)],
                pa.string(),
            ),
        }
    )
    _write(tbl, out / "events.parquet")


TPCH_OFFSETS = {
    # table -> {column: source key-space size (max+1), taken from sf0.1}
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "customer": {"c_custkey": "c"},
    "part": {"p_partkey": "p"},
    "supplier": {"s_suppkey": "s"},
}


def gen_tpch(con, src: str, out: Path, m: int) -> None:
    sizes = {
        "o": con.execute(
            f"select max(o_orderkey)+1 from read_parquet('{src}/orders.parquet')"
        ).fetchone()[0],
        "c": con.execute(
            f"select max(c_custkey)+1 from read_parquet('{src}/customer.parquet')"
        ).fetchone()[0],
        "p": con.execute(
            f"select max(p_partkey)+1 from read_parquet('{src}/part.parquet')"
        ).fetchone()[0],
        "s": con.execute(
            f"select max(s_suppkey)+1 from read_parquet('{src}/supplier.parquet')"
        ).fetchone()[0],
    }
    for table, keycols in TPCH_OFFSETS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"describe select * from read_parquet('{src}/{table}.parquet')"
            ).fetchall()
        ]
        selects = []
        for shard in range(m):
            exprs = ", ".join(
                f"{c} + {shard * sizes[keycols[c]]} as {c}" if c in keycols else c
                for c in cols
            )
            selects.append(
                f"select {exprs} from read_parquet('{src}/{table}.parquet')"
            )
        q = " union all ".join(selects)
        con.execute(
            f"copy ({q}) to '{out / (table + '.parquet')}' "
            f"(format parquet, row_group_size {ROW_GROUP})"
        )
        print(f"wrote {out / (table + '.parquet')} (tiled x{m})")
    for table in ("region", "nation"):
        con.execute(
            f"copy (select * from read_parquet('{src}/{table}.parquet')) "
            f"to '{out / (table + '.parquet')}' (format parquet)"
        )
        print(f"copied {table}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/_work/sfr1.0")
    ap.add_argument("--seed", type=int, default=4242)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    con = duckdb.connect()
    gen_documents(con, args.src, out, args.mult, rng)
    gen_embeddings(con, args.src, out, args.mult, rng)
    gen_events(con, args.src, out, args.mult, rng)
    gen_tpch(con, args.src, out, args.mult)
    (out / "_DONE").write_text("replica\n")
    print("done:", out)


if __name__ == "__main__":
    main()
