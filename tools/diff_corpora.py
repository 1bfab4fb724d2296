"""Corpus migration verifier: compare two corpus directories by content
manifest (q85) and report per-table row-count and checksum agreement.

The operational wrapper around q85_corpus_manifest — run it after any
copy, format migration, or engine swap:

    python tools/diff_corpora.py /root/testdata/sf0.01 /some/copy

Exit code 0 iff every table's manifest row matches; a human-readable
table on stdout either way.  The comparison is content-based and
order-independent (q85's XOR-folded digests + exact decimal sums), so a
reshuffled, repartitioned, or recompressed copy still verifies equal.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        q = entry.queries()["q85_corpus_manifest"]
        a = {r.table_name: r for r in q(spark, a_dir).collect()}
        b = {r.table_name: r for r in q(spark, b_dir).collect()}
        ok = True
        print(f"{'table':<12} {'rows':>12} {'key_xor':>8} {'numeric':>8}")
        for t in sorted(set(a) | set(b)):
            ra, rb = a.get(t), b.get(t)
            if ra is None or rb is None:
                print(f"{t:<12} {'MISSING':>12}")
                ok = False
                continue
            rows = "match" if ra.n_rows == rb.n_rows else f"{ra.n_rows}!={rb.n_rows}"
            kx = "match" if ra.key_xor == rb.key_xor else "DIFF"
            ns = "match" if ra.numeric_sum == rb.numeric_sum else "DIFF"
            if "match" not in (rows,) or kx != "match" or ns != "match":
                ok = False
            print(f"{t:<12} {rows:>12} {kx:>8} {ns:>8}")
        print("RESULT:", "EQUAL" if ok else "DIFFERENT")
        return 0 if ok else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
