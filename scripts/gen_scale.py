#!/usr/bin/env python3
"""Generate an N-x scale-up of the test tables for the SCALE.md
linearity evidence. NOT checked-in data: writes parquet under the
repo's target/ dir (or any given outDir).

Method (seeded, reproducible):
- documents: sample a source doc per output row, re-draw ~20% of its
  tokens from the corpus vocabulary — preserves the token distribution,
  doc-length distribution, and the natural near-duplicate structure
  (perturbed copies of the same source are exactly the near-dup shape
  MinHash/SimHash bucket on).
- embeddings: sample a source vector per output row, add N(0, 0.05)
  noise per component — preserves the cluster structure the cosine-LSH /
  SemDeDup / IVF paths rely on, with fresh ids.
- lineitem + orders (relational fact tables): N replicas with the order
  keys shifted per replica (vectorized arrow column arithmetic, so 100x
  of a 600k-row lineitem stays fast and memory-bounded) — preserves
  per-order fan-in, join selectivities, and column distributions while
  the facts grow Nx.
- customer/supplier/part/nation/region (dims): copied verbatim — the
  realistic shape at scale is facts growing much faster than dims, and
  it keeps every fact->dim key valid.

Usage: gen_scale.py <srcSfDir> <outDir> <factor> [seed]
"""
import os, shutil, sys, random
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 20260813
    rng = random.Random(seed)

    docs = pq.read_table(f"{src}/documents.parquet").to_pylist()
    vocab = sorted({t for d in docs for t in d["text"].split()})
    n_out = len(docs) * factor
    rows = []
    for i in range(n_out):
        s = docs[rng.randrange(len(docs))]
        toks = s["text"].split()
        toks = [rng.choice(vocab) if rng.random() < 0.2 else t for t in toks]
        text = " ".join(toks)
        rows.append({"doc_id": 10_000_000 + i, "text": text,
                     "lang": s["lang"], "source": s["source"],
                     "n_chars": len(text)})
    pq.write_table(pa.Table.from_pylist(rows), f"{out}/documents.parquet")

    emb = pq.read_table(f"{src}/embeddings.parquet").to_pylist()
    erows = []
    for i in range(len(emb) * factor):
        s = emb[rng.randrange(len(emb))]
        vec = [v + rng.gauss(0.0, 0.05) for v in s["embedding"]]
        erows.append({"vec_id": 10_000_000 + i,
                      "embedding": [float(v) for v in vec],
                      "label": s["label"]})
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    pq.write_table(pa.Table.from_pylist(erows, schema=schema),
                   f"{out}/embeddings.parquet")

    # relational facts: N key-shifted replicas (vectorized; arrow chunks
    # share the unmodified column buffers, so this is cheap even at 100x)
    KEY_STRIDE = 100_000_000
    for tname, keycol in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        t = pq.read_table(f"{src}/{tname}.parquet")
        ki = t.schema.get_field_index(keycol)
        reps = [t.set_column(ki, keycol,
                             pc.add(t.column(keycol), r * KEY_STRIDE))
                for r in range(factor)]
        pq.write_table(pa.concat_tables(reps), f"{out}/{tname}.parquet")

    # events: N replicas with event_id shifted and user_id offset per
    # replica (fresh sessions/users rather than 10x-duplicated ones —
    # window/session group COUNT grows, per-group size stays realistic)
    ev = pq.read_table(f"{src}/events.parquet")
    ei = ev.schema.get_field_index("event_id")
    ui = ev.schema.get_field_index("user_id")
    ereps = []
    for r in range(factor):
        t = ev.set_column(ei, "event_id",
                          pc.add(ev.column("event_id"), r * KEY_STRIDE))
        t = t.set_column(ui, "user_id",
                         pc.add(ev.column("user_id"), r * 1_000_000))
        ereps.append(t)
    pq.write_table(pa.concat_tables(ereps), f"{out}/events.parquet")

    for tname in ("customer", "supplier", "part", "nation", "region"):
        shutil.copyfile(f"{src}/{tname}.parquet", f"{out}/{tname}.parquet")

    print(f"wrote {n_out} docs, {len(erows)} embeddings, "
          f"{factor}x facts to {out}")

if __name__ == "__main__":
    main()
