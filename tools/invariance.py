#!/usr/bin/env python3
"""Partition-count invariance check: the same registry, run at two
different parallelism levels, must produce bit-identical outputs for
EVERY query — including the no_oracle ones the DuckDB gate checks only
by row count. This is the closest in-sandbox proxy for "same answer on
a 1000-executor cluster": it catches order-dependent collect_list,
non-commutative float accumulation, and partition-local tie-breaks
that a single fixed-parallelism gate run can hide.

Usage:
  SPARK_GRAFT_CPUS=2  sbt "runMain graft.Verify <sfDir> /tmp/vA"
  SPARK_GRAFT_CPUS=16 sbt "runMain graft.Verify <sfDir> /tmp/vB"
  python3 tools/invariance.py /tmp/vA /tmp/vB
"""
import glob, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow.parquet as pq
from check import table_to_rows  # the gate's own normalization, reused

def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(n for n in os.listdir(a) if os.path.isdir(os.path.join(a, n)))
    diff = same = 0
    for n in names:
        fa = glob.glob(os.path.join(a, n, "*.parquet"))
        fb = glob.glob(os.path.join(b, n, "*.parquet"))
        if not fa or not fb:
            print(f"MISSING {n}: a={bool(fa)} b={bool(fb)}")
            diff += 1
            continue
        ca, ra = table_to_rows(pq.read_table(fa[0]))
        cb, rb = table_to_rows(pq.read_table(fb[0]))
        if ca != cb or ra != rb:
            print(f"DIFF {n}: {len(ra)} vs {len(rb)} rows")
            diff += 1
        else:
            same += 1
    print(f"== {same} identical, {diff} differ ==")
    sys.exit(1 if diff else 0)

if __name__ == "__main__":
    main()
