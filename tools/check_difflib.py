#!/usr/bin/env python3
"""Randomized validation of the q_link_ro difflib oracle (dev tool).

The recursive-CTE chain in SparkEntry.sqlDifflibChain rests on one
characterization: with no junk, difflib find_longest_match's winner is the
first (end_i, end_j) in (i asc, j asc) scan order attaining the maximal
segment-bounded run length. Supplier names rarely exercise tie-breaks, so
this script retargets the COMMITTED oracle SQL (from a Verify dump's
oracle_sql.json) at random small-alphabet strings — heavy repeats, heavy
ties — and compares cluster-for-cluster against CPython difflib.

  sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/vout"
  python3 tools/check_difflib.py /tmp/vout/oracle_sql.json [seed]
"""
import difflib
import json
import random
import sys

import duckdb

oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout/oracle_sql.json"
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7

sql = json.load(open(oracle_path))["q_link_ro"]
sql = sql.replace("SELECT DISTINCT s_name AS name FROM supplier",
                  "SELECT name FROM rnd")

random.seed(seed)
names = set()
while len(names) < 60:
    n = random.randint(1, 12)
    names.add("".join(random.choice("aab") for _ in range(n)))
names = sorted(names)

con = duckdb.connect()
con.execute("CREATE TABLE rnd(name VARCHAR)")
con.executemany("INSERT INTO rnd VALUES (?)", [(n,) for n in names])

clusters = {}
for a in names:
    for b in names:
        if a != b and difflib.SequenceMatcher(None, a, b).ratio() * 100.0 >= 80.0:
            clusters.setdefault(min(a, b), set()).add(a)
expected = sorted((k, ",".join(sorted(v))) for k, v in clusters.items())
got = sorted((r[0], r[1]) for r in con.execute(sql).fetchall())

print(f"pairs-universe: {len(names) * (len(names) - 1)}  clusters: {len(expected)}")
if got == expected:
    print("MATCH")
else:
    ge, gg = dict(expected), dict(got)
    for k in sorted(set(ge) | set(gg)):
        if ge.get(k) != gg.get(k):
            print("exp", k, ge.get(k))
            print("got", k, gg.get(k))
            break
    sys.exit(1)
