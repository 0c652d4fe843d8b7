"""Generate a scaled-up documents/embeddings testdata directory for
sf-scaling measurements (r4 verdict item 5).

Reads the driver's sf0.1 tables, fits their simple empirical structure
(word vocabulary, document length distribution, lang/source frequencies,
embedding dim/label cardinality), and writes a --factor× larger pair of
tables with fresh seeded samples. The remaining tables are symlinked
from the source dir so bench.py's warm-up loop (which touches every
TABLE_SCHEMAS entry) works against the scaled dir unchanged.

Deliberately faithful to the driver generator's data family — same
31-word vocabulary, same 10..100-word lengths — so cap/skew behavior at
the scaled size is what a real driver sf1 drop would exhibit, not an
artificially-easy decorrelated corpus.

Usage: python tools/gen_scale_data.py [--factor 10] [--seed 5]
       [--src /root/testdata/sf0.1] [--dst /root/repo/.scale/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.scale/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.dst, exist_ok=True)

    docs = pq.read_table(f"{args.src}/documents.parquet")
    texts = docs.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in t.lower().split() if w})
    lengths = np.array([len(t.split()) for t in texts])
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    n_out = len(texts) * args.factor

    out_len = rng.choice(lengths, size=n_out)
    words = rng.choice(vocab, size=int(out_len.sum()))
    offs = np.concatenate([[0], np.cumsum(out_len)]).astype(int)
    out_text = [" ".join(words[offs[i] : offs[i + 1]]) for i in range(n_out)]
    out = pa.table(
        {
            "doc_id": pa.array(range(n_out), pa.int64()),
            "text": pa.array(out_text),
            "lang": pa.array(rng.choice(langs, size=n_out)),
            "source": pa.array(rng.choice(sources, size=n_out)),
            "n_chars": pa.array([len(t) for t in out_text], pa.int64()),
        }
    )
    pq.write_table(out, f"{args.dst}/documents.parquet")

    emb = pq.read_table(f"{args.src}/embeddings.parquet")
    dim = len(emb.column("embedding")[0])
    labels = np.array(emb.column("label").to_pylist())
    m_out = len(labels) * args.factor
    vecs = rng.normal(0, 1, size=(m_out, dim)).astype(np.float32)
    out_emb = pa.table(
        {
            "vec_id": pa.array(range(m_out), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(
                rng.choice(np.unique(labels), size=m_out).astype(np.int32),
                pa.int32(),
            ),
        }
    )
    pq.write_table(out_emb, f"{args.dst}/embeddings.parquet")

    # events: factor× MORE EPISODES with the source's per-episode length
    # distribution intact — each replica shifts user_id/event_id into a
    # fresh range, so trajectory work scales in episode count (the way a
    # real fleet grows) rather than in per-episode length.
    ev = pq.read_table(f"{args.src}/events.parquet")
    uid = np.array(ev.column("user_id").to_pylist(), np.int64)
    eid = np.array(ev.column("event_id").to_pylist(), np.int64)
    u_span, e_span = uid.max() + 1, eid.max() + 1
    reps = []
    for r in range(args.factor):
        reps.append(
            pa.table(
                {
                    "event_id": pa.array(eid + r * e_span, pa.int64()),
                    "ts": ev.column("ts"),
                    "user_id": pa.array(uid + r * u_span, pa.int64()),
                    "event_type": ev.column("event_type"),
                    "value": ev.column("value"),
                    "props": ev.column("props"),
                }
            )
        )
    pq.write_table(pa.concat_tables(reps), f"{args.dst}/events.parquet")

    # TPC-H-ish tables (r11 verdict item 4): the relational contract
    # queries need a REAL 10x to sweep — a symlinked lineitem makes
    # their measured exponent 0 by construction. Fact/dim tables
    # replicate with CONSISTENT key shifts (each replica moves
    # orderkey/custkey/partkey/suppkey into a fresh range in every
    # table that carries them), so join selectivities and per-key group
    # sizes are preserved while row counts scale by --factor — the way
    # TPC-H itself grows with SF. region/nation stay symlinked: they
    # are fixed-cardinality at EVERY real SF.
    key_shift = {
        "orders": {"o_orderkey": None, "o_custkey": None},
        "lineitem": {"l_orderkey": None, "l_partkey": None, "l_suppkey": None},
        "customer": {"c_custkey": None},
        "supplier": {"s_suppkey": None},
        "part": {"p_partkey": None},
    }
    # span per base key = max over EVERY table carrying it (a shift
    # computed from a referencing table alone could be smaller than the
    # referenced table's own key domain and make replicas collide)
    spans: dict[str, int] = {}
    for t, key_cols in key_shift.items():
        for col in key_cols:
            base = col.split("_", 1)[1]  # o_orderkey -> orderkey
            tbl = pq.read_table(f"{args.src}/{t}.parquet", columns=[col])
            mx = int(np.max(tbl.column(col).to_numpy())) + 1
            spans[base] = max(spans.get(base, 0), mx)

    def _span(table: str, col: str) -> int:
        return spans[col.split("_", 1)[1]]

    for t in ["orders", "lineitem", "customer", "supplier", "part"]:
        src_t = pq.read_table(f"{args.src}/{t}.parquet")
        reps = []
        for r in range(args.factor):
            cols = {}
            for name in src_t.column_names:
                col = src_t.column(name)
                if name in key_shift[t]:
                    arr = col.to_numpy() + r * _span(t, name)
                    cols[name] = pa.array(arr, col.type)
                else:
                    cols[name] = col
            reps.append(pa.table(cols))
        pq.write_table(pa.concat_tables(reps), f"{args.dst}/{t}.parquet")

    for t in ["region", "nation"]:
        link = f"{args.dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{args.src}/{t}.parquet", link)
    print(
        f"wrote {n_out} docs ({len(vocab)}-word vocab), {m_out} embeddings "
        f"(dim {dim}), {args.factor}x TPC-H fact tables to {args.dst}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
