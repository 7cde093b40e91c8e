"""Generate a larger scale point from the sf0.1 fixtures for the
BASELINE §5c crossover measurement.

The driver ships sf{0.001,0.01,0.1}; the §5b sweep extrapolates the
Spark-vs-DuckDB crossover to sf≈0.5-1, which needs a measured point
beyond sf0.1. This produces a distribution-matched PROXY at an
arbitrary multiple of sf0.1 (NOT a driver fixture — both engines read
the same generated files, so the ratio comparison stays fair):

- rows are sampled WITH REPLACEMENT from the sf0.1 tables, preserving
  intra-row correlations (value marginals, date ranges, string
  formats);
- primary keys are rewritten to contiguous 1..N (so e.g. the closure
  demo's bounded 2..2000 key range keeps identical semantics);
- foreign keys are re-drawn uniformly over the scaled parent range
  (uniform fan-out ≈ the fixture's own uniform key draw);
- `documents.text` is re-synthesized per sampled row by token
  perturbation (each token replaced with prob 0.5 from the global
  fixture vocabulary) so cross-sample copies are NOT near-duplicates
  (3-gram jaccard ≈ 0.125 « the 0.3 kernel threshold), then the dedup
  structure is re-created explicitly: `exact_frac` of docs get an
  exact copy appended, `near_frac` a 2-token-perturbed copy — the same
  shape the fixture encodes (FIXTURES.md §3).

Deterministic (seed 42). Output goes OUTSIDE /root/testdata (which is
read-only): default /root/repo/.localdata/sf0.5.

Usage: python tools/gen_scale.py [--mult 5] [--out /root/repo/.localdata/sf0.5]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _read(name: str) -> pa.Table:
    return pq.read_table(f"{SRC}/{name}.parquet")


def _sample(table: pa.Table, n: int, rng: np.random.Generator) -> pa.Table:
    idx = rng.integers(0, table.num_rows, size=n)
    return table.take(pa.array(idx))


def _seq(name: str, n: int, dtype=pa.int64()) -> pa.Array:
    return pa.array(np.arange(1, n + 1), type=dtype)


def gen(mult: int, out: str, exact_frac: float = 0.02, near_frac: float = 0.02) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    # fixed-size dims copy through unchanged
    for name in ("region", "nation"):
        pq.write_table(_read(name), f"{out}/{name}.parquet")

    cust = _read("customer")
    n_cust = cust.num_rows * mult
    c = _sample(cust, n_cust, rng)
    c = c.set_column(c.schema.get_field_index("c_custkey"), "c_custkey", _seq("c", n_cust))
    pq.write_table(c, f"{out}/customer.parquet")

    supp = _read("supplier")
    n_supp = supp.num_rows * mult
    s = _sample(supp, n_supp, rng)
    s = s.set_column(s.schema.get_field_index("s_suppkey"), "s_suppkey", _seq("s", n_supp))
    pq.write_table(s, f"{out}/supplier.parquet")

    part = _read("part")
    n_part = part.num_rows * mult
    p = _sample(part, n_part, rng)
    p = p.set_column(p.schema.get_field_index("p_partkey"), "p_partkey", _seq("p", n_part))
    pq.write_table(p, f"{out}/part.parquet")

    orders = _read("orders")
    n_ord = orders.num_rows * mult
    o = _sample(orders, n_ord, rng)
    o = o.set_column(o.schema.get_field_index("o_orderkey"), "o_orderkey", _seq("o", n_ord))
    o = o.set_column(
        o.schema.get_field_index("o_custkey"),
        "o_custkey",
        pa.array(rng.integers(1, n_cust + 1, size=n_ord)),
    )
    pq.write_table(o, f"{out}/orders.parquet")

    li = _read("lineitem")
    n_li = li.num_rows * mult
    l = _sample(li, n_li, rng)
    for col, hi in (("l_orderkey", n_ord), ("l_partkey", n_part), ("l_suppkey", n_supp)):
        l = l.set_column(
            l.schema.get_field_index(col), col, pa.array(rng.integers(1, hi + 1, size=n_li))
        )
    pq.write_table(l, f"{out}/lineitem.parquet")

    ev = _read("events")
    n_ev = ev.num_rows * mult
    e = _sample(ev, n_ev, rng)
    e = e.set_column(e.schema.get_field_index("event_id"), "event_id", _seq("e", n_ev))
    e = e.set_column(
        e.schema.get_field_index("user_id"),
        "user_id",
        pa.array(rng.integers(1, n_cust + 1, size=n_ev)),
    )
    pq.write_table(e, f"{out}/events.parquet")

    _gen_documents(mult, out, rng, exact_frac, near_frac)

    emb = _read("embeddings") if os.path.exists(f"{SRC}/embeddings.parquet") else None
    if emb is not None:
        n_emb = emb.num_rows * mult
        m = _sample(emb, n_emb, rng)
        m = m.set_column(
            m.schema.get_field_index("vec_id"),
            "vec_id",
            pa.array(np.arange(n_emb), type=m.schema.field("vec_id").type),
        )
        pq.write_table(m, f"{out}/embeddings.parquet")


def _gen_documents(
    mult: int, out: str, rng: np.random.Generator, exact_frac: float, near_frac: float
) -> None:
    docs = _read("documents")
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    vocab = np.array(sorted({t for tx in texts for t in tx.split(" ")}))

    n_base = docs.num_rows * mult
    base_idx = rng.integers(0, len(texts), size=n_base)
    out_text, out_lang, out_src = [], [], []
    for i, bi in enumerate(base_idx):
        toks = texts[bi].split(" ")
        # heavy perturbation: cross-sample copies of one source row are
        # NOT near-dups (3-gram jaccard ≈ 0.5³); vocabulary and length
        # distributions are preserved
        mask = rng.random(len(toks)) < 0.5
        repl = rng.integers(0, len(vocab), size=len(toks))
        out_text.append(
            " ".join(vocab[repl[j]] if mask[j] else t for j, t in enumerate(toks))
        )
        out_lang.append(langs[bi])
        out_src.append(sources[bi])

    # re-create the dedup structure explicitly
    n_exact = int(n_base * exact_frac)
    n_near = int(n_base * near_frac)
    for i in rng.integers(0, n_base, size=n_exact):
        out_text.append(out_text[i]); out_lang.append(out_lang[i]); out_src.append(out_src[i])
    for i in rng.integers(0, n_base, size=n_near):
        toks = out_text[i].split(" ")
        for j in rng.integers(0, len(toks), size=min(2, len(toks))):
            toks[j] = vocab[rng.integers(0, len(vocab))]
        out_text.append(" ".join(toks)); out_lang.append(out_lang[i]); out_src.append(out_src[i])

    n = len(out_text)
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": pa.array(out_text),
            "lang": pa.array(out_lang),
            "source": pa.array(out_src),
            "n_chars": pa.array(np.array([len(t) for t in out_text]), type=pa.int64()),
        }
    )
    pq.write_table(table, f"{out}/documents.parquet")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=5)
    ap.add_argument("--out", default="/root/repo/.localdata/sf0.5")
    args = ap.parse_args()
    gen(args.mult, args.out)
    print(f"wrote {args.out}")
