#!/usr/bin/env python3
"""Compare two graft.Verify output dirs (old vs new) query by query.

Equality contract: same schema (column names/types sorted by name), same
row count, and same multiset of rows IN THE QUERY'S OWN ORDER (queries
pin order via ORDER BY on a unique key, so positional compare is exact).
Used in optimization rounds to prove a restructured query computes the
identical result before shipping it.
"""
import sys, glob, os
import pyarrow.parquet as pq

def load(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    tabs = [pq.read_table(f) for f in files]
    import pyarrow as pa
    t = pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]
    # sort columns by name (the driver's hashing convention)
    return t.select(sorted(t.column_names))

def main(a_dir, b_dir):
    qs = sorted(set(os.listdir(a_dir)) | set(os.listdir(b_dir)))
    qs = [q for q in qs if q.startswith("q")]
    bad = []
    for q in qs:
        ta, tb = load(os.path.join(a_dir, q)), load(os.path.join(b_dir, q))
        if ta is None or tb is None:
            bad.append((q, f"missing: old={ta is not None} new={tb is not None}"))
            continue
        if ta.column_names != tb.column_names:
            bad.append((q, f"schema: {ta.column_names} vs {tb.column_names}"))
            continue
        if ta.num_rows != tb.num_rows:
            bad.append((q, f"rows: {ta.num_rows} vs {tb.num_rows}"))
            continue
        if not ta.equals(tb):
            # find first differing column for the report
            detail = []
            for c in ta.column_names:
                if not ta.column(c).equals(tb.column(c)):
                    detail.append(c)
            bad.append((q, f"values differ in columns: {detail}"))
    print(f"compared {len(qs)} queries: {len(qs) - len(bad)} identical, {len(bad)} differ")
    for q, why in bad:
        print(f"  DIFF {q}: {why}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
