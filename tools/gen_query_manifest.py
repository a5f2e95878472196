#!/usr/bin/env python3
"""Regenerate tools/query_files.tsv: query name -> defining source file.

A query's defining file is the one whose `QuerySpec(` call carries the
query-name string literal as its first argument (the registration idiom
used by every operator file). Bench reads the committed tsv at run time
to stamp `files_changed` on persistent bench flags (did the defining
file change since the flag's baseline history line's commit);
QueryManifestSpec re-runs this same scan in CI and fails when the
committed file is stale.

Usage: python3 tools/gen_query_manifest.py   (from the repo root)
"""
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "src" / "main" / "scala"
OUT = ROOT / "tools" / "query_files.tsv"

# first string literal after QuerySpec( — whitespace/newlines allowed
NAME_RE = re.compile(r'QuerySpec\(\s*"([A-Za-z0-9_]+)"')


def scan():
    mapping = {}
    for path in sorted(SRC.rglob("*.scala")):
        rel = path.relative_to(ROOT).as_posix()
        for name in NAME_RE.findall(path.read_text()):
            if name in mapping:
                sys.exit(f"duplicate QuerySpec name {name}: "
                         f"{mapping[name]} and {rel}")
            mapping[name] = rel
    return mapping


if __name__ == "__main__":
    mapping = scan()
    lines = "".join(f"{n}\t{f}\n" for n, f in sorted(mapping.items()))
    OUT.write_text(lines)
    print(f"wrote {len(mapping)} entries to {OUT}")
