#!/usr/bin/env python3
"""Layout-independence compare: two Verify artifact dirs, bit-for-bit.

The engine's determinism contract says every query's result is
BIT-IDENTICAL regardless of session parallelism (7-way vs 32-way is
the standard sweep — it shifts partition counts, shuffle layouts, and
task scheduling everywhere). This has been checked ad hoc with inline
pyarrow since round 5; committed here so the sweep is one command:

    SPARK_GRAFT_CPUS=7 sbt -batch "runMain graft.Verify <sf> /tmp/v7"
    sbt -batch "runMain graft.Verify <sf> /tmp/v32"
    python3 tools/layout_compare.py /tmp/v32 /tmp/v7

Compares every query subdirectory present in the FIRST dir (Verify
names artifact dirs exactly by query name); a dir missing from the
second, a read error, or any pyarrow Table inequality is a failure.
Exit 0 = all bit-identical.
"""
import pathlib
import sys

import pyarrow.parquet as pq


def main(a_dir: str, b_dir: str) -> int:
    a_root, b_root = pathlib.Path(a_dir), pathlib.Path(b_dir)
    names = sorted(p.name for p in a_root.iterdir() if p.is_dir())
    if not names:
        print(f"no query dirs under {a_root}", file=sys.stderr)
        return 2
    bad = []
    for n in names:
        try:
            if not pq.read_table(a_root / n).equals(pq.read_table(b_root / n)):
                bad.append((n, "tables differ"))
        except Exception as e:  # missing dir, schema mismatch, read error
            bad.append((n, f"{type(e).__name__}: {e}"))
    for n, why in bad:
        print(f"MISMATCH {n}: {why}")
    print(f"{len(names) - len(bad)} identical, {len(bad)} mismatched "
          f"(of {len(names)})")
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
