"""Generate a LOCAL sf1 dataset (10x sf0.1) for the scale bench point.

/root/testdata is read-only and driver-owned, so sf1 lives under the
repo at .localdata/sf1 (gitignored). This is a BENCH dataset, not a
correctness dataset: no oracle sweep runs against it — what must be
faithful is the SHAPE of the data, not its values. Strategy per table:

  * region/nation: fixed-cardinality dims, copied verbatim.
  * customer/supplier/part/orders/lineitem: key domains scale 10x
    (contiguous like the source); every non-key column is resampled
    with replacement from the sf0.1 EMPIRICAL distribution (marginals
    preserved exactly — selectivities of the TPC-H-shaped predicates
    like p_type='LARGE' or r_name='EUROPE' carry over); foreign keys
    are uniform over the scaled parent domain, preserving the source's
    average fan-outs (4 lineitems/order, 10 orders/customer).
  * events: 10x rows over the SAME time span (10x density), user_id
    uniform over 10x users (same ~67 events/user), ts sorted and
    event_id assigned in ts order, matching the source invariant.
  * documents: regenerated from the sf0.1 vocabulary (frequency-
    weighted) with the empirical token-length distribution; the same
    ~0.16% exact-duplicate rate is planted so dedup benches keep their
    selectivity profile.
  * embeddings: labels resampled empirically; vectors ~N(0, sigma) at
    the source dimension with per-dim sigma estimated from the source
    (ANN benches care about dim, count, and norm scale only).

Deterministic: numpy seed 42 throughout.

Usage: python tools/gen_sf1.py [dst_dir] [factor] [table,table,...]

Large factors (>= ~300) stream the row-heavy tables (orders, lineitem,
events) through a ParquetWriter in <=20M-row chunks so peak memory
stays bounded at any factor; the optional table filter lets an sf100
TPC-H-only point skip the corpus tables entirely.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _read(name: str) -> pa.Table:
    return pq.read_table(f"{SRC}/{name}.parquet")


def _resample_col(rng, col: pa.ChunkedArray, n: int) -> pa.Array:
    arr = col.combine_chunks()
    idx = rng.integers(0, len(arr), size=n)
    return arr.take(pa.array(idx))


def _scaled_table(
    rng, name: str, n: int, key_overrides: dict[str, np.ndarray]
) -> pa.Table:
    """Resample every column empirically except the explicit key
    columns, which the caller provides at the scaled domain."""
    src = _read(name)
    cols, names = [], []
    for field in src.schema:
        names.append(field.name)
        if field.name in key_overrides:
            cols.append(
                pa.array(key_overrides[field.name]).cast(field.type)
            )
        else:
            cols.append(_resample_col(rng, src.column(field.name), n))
    return pa.table(dict(zip(names, cols)))


CHUNK = 20_000_000


def _write_chunked(rng, name: str, dst: str, n: int, key_fn) -> None:
    """Stream a scaled table in <=CHUNK-row pieces: key_fn(lo, size)
    returns the key-override dict for rows [lo, lo+size)."""
    writer = None
    for lo in range(0, n, CHUNK):
        size = min(CHUNK, n - lo)
        t = _scaled_table(rng, name, size, key_fn(lo, size))
        if writer is None:
            writer = pq.ParquetWriter(f"{dst}/{name}.parquet", t.schema)
        writer.write_table(t)
    if writer is not None:
        writer.close()
    print(name, n)


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    want = lambda t: only is None or t in only
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(42)

    # fixed dims: copy verbatim
    for t in ("region", "nation"):
        if want(t):
            pq.write_table(_read(t), f"{dst}/{t}.parquet")
            print(t, "copied")

    n_cust, n_supp, n_part = 15000 * factor, 1000 * factor, 20000 * factor
    n_ord, n_li = 150000 * factor, 600000 * factor

    if want("customer"):
        _write_chunked(
            rng, "customer", dst, n_cust,
            lambda lo, sz: {"c_custkey": np.arange(lo, lo + sz, dtype=np.int64)},
        )
    if want("supplier"):
        pq.write_table(
            _scaled_table(
                rng, "supplier", n_supp,
                {"s_suppkey": np.arange(n_supp, dtype=np.int64)},
            ),
            f"{dst}/supplier.parquet",
        )
        print("supplier", n_supp)
    if want("part"):
        _write_chunked(
            rng, "part", dst, n_part,
            lambda lo, sz: {"p_partkey": np.arange(lo, lo + sz, dtype=np.int64)},
        )
    if want("orders"):
        _write_chunked(
            rng, "orders", dst, n_ord,
            lambda lo, sz: {
                "o_orderkey": np.arange(lo, lo + sz, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, size=sz),
            },
        )
    if want("lineitem"):
        _write_chunked(
            rng, "lineitem", dst, n_li,
            lambda lo, sz: {
                "l_orderkey": rng.integers(0, n_ord, size=sz),
                "l_partkey": rng.integers(0, n_part, size=sz),
                "l_suppkey": rng.integers(0, n_supp, size=sz),
            },
        )
    if not want("events"):
        pass
    else:
        _gen_events(rng, dst, factor)
    if want("documents"):
        _gen_documents(rng, dst, factor)
    if want("embeddings"):
        _gen_embeddings(rng, dst, factor)


def _gen_events(rng, dst: str, factor: int) -> None:
    # events: same span, 10x density, ts-ordered event ids
    ev = _read("events")
    n_ev = ev.num_rows * factor
    ts_src = ev.column("ts").combine_chunks().cast(pa.int64()).to_numpy()
    ts = np.sort(
        rng.integers(ts_src.min(), ts_src.max() + 1, size=n_ev)
    )
    n_users = 1500 * factor
    over = {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, size=n_ev),
    }
    src_ts_type = ev.schema.field("ts").type
    cols = {}
    for field in ev.schema:
        if field.name == "ts":
            cols["ts"] = pa.array(ts).cast(src_ts_type)
        elif field.name in over:
            cols[field.name] = pa.array(over[field.name]).cast(field.type)
        else:
            cols[field.name] = _resample_col(rng, ev.column(field.name), n_ev)
    pq.write_table(pa.table(cols), f"{dst}/events.parquet")
    print("events", n_ev)


def _gen_documents(rng, dst: str, factor: int) -> None:
    # documents: regenerate from the source vocabulary + length dist
    doc = _read("documents")
    n_doc = doc.num_rows * factor
    texts = doc.column("text").combine_chunks().to_pylist()
    from collections import Counter

    vocab_counts = Counter(tok for t in texts for tok in t.split())
    vocab = np.array(sorted(vocab_counts))
    probs = np.array([vocab_counts[v] for v in vocab], dtype=float)
    probs /= probs.sum()
    lengths = np.array([len(t.split()) for t in texts])
    new_lens = rng.choice(lengths, size=n_doc)
    toks = rng.choice(vocab, size=int(new_lens.sum()), p=probs)
    out_texts, pos = [], 0
    for ln in new_lens:
        out_texts.append(" ".join(toks[pos : pos + ln]))
        pos += ln
    # plant the source's exact-duplicate rate (~0.16%)
    n_dup = max(1, int(round(n_doc * (1 - 4992 / 5000))))
    dup_dst = rng.choice(n_doc, size=n_dup, replace=False)
    dup_src = rng.integers(0, n_doc, size=n_dup)
    for a, b in zip(dup_dst, dup_src):
        out_texts[a] = out_texts[b]
    cols = {"doc_id": pa.array(np.arange(n_doc, dtype=np.int64))}
    cols["text"] = pa.array(out_texts)
    for c in ("lang", "source"):
        cols[c] = _resample_col(rng, doc.column(c), n_doc)
    cols["n_chars"] = pa.array(
        np.array([len(t) for t in out_texts], dtype=np.int64)
    )
    pq.write_table(
        pa.table(cols).cast(doc.schema), f"{dst}/documents.parquet"
    )
    print("documents", n_doc)


def _gen_embeddings(rng, dst: str, factor: int) -> None:
    # embeddings: empirical labels, gaussian vectors at the source dim
    emb = _read("embeddings")
    n_emb = emb.num_rows * factor
    first = emb.column("embedding").combine_chunks()
    dim = len(first[0])
    sample = np.array(first.slice(0, 200).to_pylist(), dtype=np.float32)
    sigma = float(sample.std())
    vecs = rng.normal(0.0, sigma, size=(n_emb, dim)).astype(np.float32)
    cols = {
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs)),
        "label": _resample_col(rng, emb.column("label"), n_emb),
    }
    pq.write_table(
        pa.table(cols).cast(emb.schema), f"{dst}/embeddings.parquet"
    )
    print("embeddings", n_emb)


if __name__ == "__main__":
    main()
