#!/usr/bin/env python3
"""Scale the driver-generated testdata by key-shifted copies.

Round-8 scale evidence (VERDICT r7 next-round #1): every 100 TB claim
was argued from plan shape but only *measured* at sf0.1. This tool
synthesizes a larger SF from an existing one by unioning N key-shifted
copies of every fact table — referential integrity preserved within a
copy (each foreign key shifts by the same stride as its parent key),
dimension tables (region/nation) shared across copies, value
distributions identical to the driver's generator by construction.

Deliberate consequence of copying text/vectors verbatim: every
document (and embedding) gains N-1 exact duplicates across copies, so
the dedup family faces 10-way duplicate clusters at sf1 — a HARSHER
workload than organically-scaled data (real crawl corpora are heavy
with exact duplication), and the right stress for the banding /
contraction paths.

Writes with pyarrow so events.ts keeps whatever physical type the
driver generation used verbatim (INT64 TIMESTAMP(NANOS) in early
generations, native timestamp[us] since round 9 — Tables.events
adapts to both; DuckDB or Spark rewrites would coerce the type).

Usage: python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/graft-sf1 10
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import os

# table -> {column: stride_source_table} ; a column shifts by
# copy_index * (max(key of stride_source_table) + 1)
SHIFTS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    # events.ts is copied VERBATIM: every timestamp appears 10 times at
    # sf1, so any window whose sort is not total within its partition
    # mismatches its oracle here. That is the point — the round-8 fix
    # made the two series-keyed windows (q_ts_wma / q_ts_anomaly)
    # tiebreak on event_id, and this harness is what keeps them honest.
    # (An earlier revision jittered ts +copy·µs to dodge the ties; that
    # masked the nondeterminism instead of fixing it.)
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_AS_IS = ["region", "nation"]


def main(src, dst, copies):
    os.makedirs(dst, exist_ok=True)
    tables = {}
    for name in COPY_AS_IS + sorted(SHIFTS):
        tables[name] = pq.read_table(f"{src}/{name}.parquet")
    strides = {}
    for name, cols in SHIFTS.items():
        for col, (stbl, scol) in cols.items():
            strides[(stbl, scol)] = (
                pc.max(tables[stbl][scol]).as_py() + 1)
    for name in COPY_AS_IS:
        pq.write_table(tables[name], f"{dst}/{name}.parquet")
        print(f"{name}: {tables[name].num_rows} rows (shared dim)")
    for name in sorted(SHIFTS):
        t = tables[name]
        parts = []
        for c in range(copies):
            part = t
            for col, key in SHIFTS[name].items():
                idx = part.schema.get_field_index(col)
                shifted = pc.add(part[col], c * strides[key])
                part = part.set_column(idx, part.schema.field(idx),
                                       shifted.cast(part.schema.field(idx).type))
            parts.append(part)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    main(src, dst, copies)
