"""10x scale-rehearsal fixture (VERDICT r3 #5): a deterministic
sf1-equivalent table set derived from /root/testdata/sf0.1 by
key-offset replication, written once to /tmp/ccrawler_sf1.

Replication rules (replica r in 0..mult-1):
- dims region/nation copy unchanged (nationkeys stay 0..24).
- every entity key shifts by r * (max_key + 1): customer, supplier,
  part, orders, lineitem FKs, events user/event ids, embeddings
  vec_id, documents doc_id (doc_id stays CONTIGUOUS 0..10n-1, the
  corpus-lift precondition).
- documents TEXT is perturbed for r > 0 (a replica-unique token
  spliced every PERTURB_EVERY words): replicated docs must NOT become
  cross-replica near-duplicates, or dedup pair counts would grow
  quadratically by construction rather than by workload. Within a
  replica the original near-dup structure is preserved, so dup RATE
  matches sf0.1. n_chars is recomputed.
- embeddings get per-replica deterministic gaussian noise (2% of the
  global std) so ANN/dup families see 10x distinct points, not 10
  copies of each point.

Everything is seeded — two builds are byte-identical; a done-marker
memoizes the build across sessions.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/ccrawler_sf1"
MULT = 10
PERTURB_EVERY = 5

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# table -> {column: which entity's key space it belongs to}
KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def _key_spans(tables: dict) -> dict:
    spans = {}
    for tname, cols in KEY_COLS.items():
        t = tables[tname]
        for col, space in cols.items():
            mx = pc.max(t.column(col)).as_py() or 0
            spans[space] = max(spans.get(space, 0), int(mx) + 1)
    return spans


def _perturb_texts(texts: list[str], r: int) -> list[str]:
    tok = f"zq{r}"
    out = []
    for s in texts:
        w = s.split()
        parts = []
        for o in range(0, len(w), PERTURB_EVERY):
            parts.extend(w[o: o + PERTURB_EVERY])
            parts.append(tok)
        out.append(" ".join(parts))
    return out


def _replica(tables: dict, spans: dict, name: str, r: int) -> pa.Table:
    t = tables[name]
    if r > 0:
        for col, space in KEY_COLS.get(name, {}).items():
            arr = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col, pa.array(arr + r * spans[space]))
    if name == "documents" and r > 0:
        texts = _perturb_texts(t.column("text").to_pylist(), r)
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(texts, pa.string()))
        t = t.set_column(
            t.schema.get_field_index("n_chars"), "n_chars",
            pa.array(np.array([len(s) for s in texts], dtype=np.int64)))
    if name == "embeddings" and r > 0:
        emb = t.column("embedding").combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        rng = np.random.default_rng(42_000 + r)
        noisy = (flat + rng.normal(0.0, 0.02 * flat.std(), flat.size)
                 ).astype(np.float32)
        arr = pa.ListArray.from_arrays(emb.offsets, pa.array(noisy))
        t = t.set_column(t.schema.get_field_index("embedding"),
                         pa.field("embedding", arr.type), arr)
    return t


def ensure_scaled(src: str = SRC, out: str = OUT, mult: int = MULT) -> str:
    outp = Path(out)
    done = outp / "_SCALE_DONE"
    if done.exists():
        return out
    outp.mkdir(parents=True, exist_ok=True)
    tables = {n: pq.read_table(f"{src}/{n}.parquet") for n in TABLES}
    spans = _key_spans(tables)
    for name in TABLES:
        if name in ("region", "nation"):
            big = tables[name]
        else:
            big = pa.concat_tables(
                [_replica(tables, spans, name, r) for r in range(mult)]
            ).combine_chunks()
        # several row groups so per-group column statistics bound scans
        rg = max(16384, big.num_rows // 16) if big.num_rows > 16384 else None
        tmp = outp / f"{name}.parquet.tmp"
        pq.write_table(big, tmp, row_group_size=rg)
        os.replace(tmp, outp / f"{name}.parquet")
        print(f"{name}: {big.num_rows} rows")
    done.touch()
    return out


if __name__ == "__main__":
    ensure_scaled()
