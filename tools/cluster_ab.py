"""Interleaved A/B bench for dedup_clusters variants at sf0.1 (pattern of
tools/pip_ab.py): measures the full gate query wall best-of-N per arm in
one session, alternating arms so host drift hits both equally.

Usage: python tools/cluster_ab.py [sf_dir] [n_iters]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from projcl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("cluster_ab", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # warm the signature checkpoint once so every timed run measures the
    # pairs join + component loop, not the parquet write
    E.q_dedup_clusters(spark, sf_dir).count()
    walls: list[float] = []
    for i in range(n):
        t0 = time.perf_counter()
        cnt = E.q_dedup_clusters(spark, sf_dir).count()
        walls.append(time.perf_counter() - t0)
        print(f"iter {i}: {walls[-1]:.3f}s ({cnt} clusters)")
    print(f"best-of-{n}: {min(walls):.3f}s  median: {sorted(walls)[n // 2]:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
