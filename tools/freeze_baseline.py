#!/usr/bin/env python3
"""Baseline freeze tooling (round-18 item 5): maintain BASELINE_QUERIES.json
with a MACHINE-READABLE per-query provenance map next to the frozen values,
so the recheck classifier and the judge can consume per-row provenance
(which windows priced the row, under which convention, what it replaced)
without hand-parsing the frozen_from prose. The prose stays as a summary;
this tool is the only writer of the structured part.

Schema (validated by `validate` and by BaselineProvenanceSpec):

  {
    "frozen_from": "<prose summary>",
    "n_queries": <int>,            # == len(query_min_s)
    "total_s": <float>,            # == round(sum(query_min_s.values()), 1)
    "query_min_s": {"q_x": 1.23, ...},
    "provenance": {
      "q_x": {
        "frozen_s": 1.23,          # == query_min_s["q_x"] (key order fixed
        "n_windows": 3,            #    for stable diffs; consumers parse
        "windows": [["r10a",1.25], #    real JSON, never position)
                 ["r17drv",1.23]], # (label, min) of every window that
                                   # priced the row; labels rNN[a-z] are
                                   # committed builder windows, rNNdrv
                                   # driver windows, rNNtK targeted
        "convention": "min",       # min | serve_priced | publish_inclusive
                                   #     | deliberate_config
        "refrozen": [["r17",6.584]],  # prior frozen values this replaced
        "note": "..."              # optional free-text attribution
      }, ...
    }
  }

Commands:
  backfill               rebuild provenance windows from BENCH_r*.json in
                         the repo root (idempotent; keeps notes/refrozen)
  add L=FILE [L=FILE..] --queries q_a,q_b
                         freeze NEW rows at the min across the given
                         window artifacts; windows recorded with labels
  window L=FILE --queries q_a,q_b
                         append windows to EXISTING rows (no refreeze)
  refreeze q_x=VAL --label L [--note "..."]
                         replace a frozen value, recording the prior one
  note q_x --note "..."  attach/replace a row's attribution note
  validate               check every schema invariant, exit 1 on failure
"""
import glob
import json
import os
import re
import sys

BASELINE = os.environ.get("SPARK_GRAFT_BASELINE", "BASELINE_QUERIES.json")
CONVENTIONS = {"min", "serve_priced", "publish_inclusive",
               "deliberate_config"}
# Rows whose entries deliberately price more than a bare min-of-attempts
# serve (see OPERATIONS.md "Serve-pricing convention" and the frozen_from
# prose). Everything else is "min".
CONVENTION_OVERRIDES = {
    "q_cluster_cc_serve": "serve_priced",
    "q_cluster_cc_republish": "serve_priced",
    "q_cluster_cc_incremental": "publish_inclusive",
    "q_pq_probe": "deliberate_config",
    "q_pq_recall": "deliberate_config",
    "q_hamming_recall": "deliberate_config",
}
# Known re-freezes carried over from the frozen_from prose (label = the
# round that REPLACED the value, prior value second). Seeded once here;
# the `refreeze` command appends going forward.
SEED_REFROZEN = {
    "q_link_pairs_lev": [["r17", 6.584]],
    "q_semantic_dedup": [["r17", 0.538]],
    "q_hamming_recall": [["r17", 1.28]],
    "q_hamming_search_indexed": [["r17", 0.87]],
}


def load():
    with open(BASELINE) as f:
        return json.load(f)


def save(d):
    # fixed key order inside provenance entries (frozen_s first) for
    # stable diffs — consumers parse real JSON and don't depend on it
    prov = {}
    for q in sorted(d.get("provenance", {})):
        e = d["provenance"][q]
        out = {"frozen_s": e["frozen_s"], "n_windows": len(e["windows"]),
               "windows": e["windows"], "convention": e["convention"]}
        if e.get("refrozen"):
            out["refrozen"] = e["refrozen"]
        if e.get("note"):
            out["note"] = e["note"]
        prov[q] = out
    d["provenance"] = prov
    d["n_queries"] = len(d["query_min_s"])
    d["total_s"] = round(sum(d["query_min_s"].values()), 1)
    # validate BEFORE touching the file on disk: a mutation that breaks
    # an invariant must leave the committed baseline untouched, not
    # overwrite it and then complain (round-18 review)
    errs = validate(d)
    if errs:
        for e in errs:
            print("INVALID (baseline NOT written):", e)
        raise SystemExit(1)
    tmp = BASELINE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=1)
        f.write("\n")
    os.replace(tmp, BASELINE)


def read_window(path):
    with open(path) as f:
        w = json.load(f)
    return w["queries"]


def entry(d, q):
    d.setdefault("provenance", {})
    return d["provenance"].setdefault(q, {
        "frozen_s": d["query_min_s"][q], "n_windows": 0, "windows": [],
        "convention": CONVENTION_OVERRIDES.get(q, "min")})


def backfill(d):
    """Mine every same-code window the repo records: (a) the committed
    history of bench_full.json — the builder's full per-query closing
    windows, labeled rNN[a,b,..] by the round they were committed in
    (round boundaries are the driver's "round N:" commits); (b) the
    driver's BENCH_rNN.json artifacts, whose stdout tail truncates to
    the trailing "runs" arrays — whatever rows survive are labeled
    rNNd (d = driver window). Idempotent; keeps notes/refrozen and any
    windows added by `add`/`window`.
    """
    import subprocess

    def git(*a):
        return subprocess.run(["git"] + list(a), capture_output=True,
                              text=True).stdout

    windows = {}  # q -> {label: [label, min]}

    def put(q, label, v):
        windows.setdefault(q, {}).setdefault(label, [label, round(v, 3)])

    # (a) committed bench_full.json versions, oldest first, with round
    # attribution from the driver's "round N:" boundary commits
    log = git("log", "--reverse", "--format=%H\x01%s").strip().split("\n")
    rnd = 1
    per_round_seq = {}
    for line in log:
        if "\x01" not in line:
            continue
        h, subj = line.split("\x01", 1)
        m = re.match(r"round (\d+):", subj)
        if m:
            rnd = int(m.group(1)) + 1
            continue
        changed = git("diff-tree", "--no-commit-id", "--name-only",
                      "-r", h)
        if "bench_full.json" not in changed.split():
            continue
        try:
            w = json.loads(git("show", f"{h}:bench_full.json"))
            qs = w["queries"]
        except (json.JSONDecodeError, KeyError):
            continue
        seq = per_round_seq.get(rnd, 0)
        per_round_seq[rnd] = seq + 1
        label = "r%02d%s" % (rnd, "abcdefghijklmnopqrstuvwxyz"[seq % 26])
        for q, v in qs.items():
            put(q, label, v)
    # (b) driver artifacts: per-query "runs" arrays surviving in the
    # tail. Label suffix "drv", NOT a single letter: "rNNd" collides
    # with the 4th committed window's letter and setdefault would drop
    # the driver window entirely (round-18 review — rounds with 4+
    # committed windows silently lost their driver rows)
    for p in sorted(glob.glob("BENCH_r[0-9][0-9].json")):
        n = int(re.search(r"BENCH_r(\d+)\.json", p).group(1))
        try:
            with open(p) as f:
                art = json.load(f)
        except json.JSONDecodeError:
            continue
        tail = art.get("tail") or ""
        for m in re.finditer(r'"(q_[A-Za-z0-9_]+)":\[([0-9.,eE+-]+)\]',
                             tail):
            vals = [float(x) for x in m.group(2).split(",") if x]
            if vals:
                put(m.group(1), "r%02ddrv" % n, min(vals))
    for q in d["query_min_s"]:
        e = entry(d, q)
        merged = {w[0]: w for w in e["windows"]}
        for label, w in windows.get(q, {}).items():
            merged.setdefault(label, w)
        e["windows"] = [merged[k] for k in sorted(merged)]
        if q in SEED_REFROZEN and not e.get("refrozen"):
            e["refrozen"] = SEED_REFROZEN[q]
    # drop provenance for queries no longer frozen
    d["provenance"] = {q: e for q, e in d["provenance"].items()
                       if q in d["query_min_s"]}


def parse_labeled(args):
    out = []
    for a in args:
        if "=" not in a:
            break
        label, path = a.split("=", 1)
        out.append((label, path))
    return out


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    cmd, args = sys.argv[1], sys.argv[2:]
    d = load()

    def opt(name):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return None

    note = opt("--note")
    label = opt("--label")
    queries = opt("--queries")
    queries = queries.split(",") if queries else []

    if cmd == "backfill":
        backfill(d)
    elif cmd == "add":
        wins = parse_labeled(args)
        assert wins and queries, "add needs L=FILE... --queries q_a,q_b"
        data = [(lb, read_window(p)) for lb, p in wins]
        for q in queries:
            vals = [(lb, round(qs[q], 3)) for lb, qs in data if q in qs]
            assert vals, f"{q} in none of the windows"
            assert q not in d["query_min_s"], \
                f"{q} already frozen — use refreeze/window"
            d["query_min_s"][q] = min(v for _, v in vals)
            e = entry(d, q)
            e["windows"] = [[lb, v] for lb, v in vals]
            if note:
                e["note"] = note
    elif cmd == "window":
        wins = parse_labeled(args)
        assert wins and queries, "window needs L=FILE... --queries ..."
        data = [(lb, read_window(p)) for lb, p in wins]
        for q in queries:
            e = entry(d, q)
            have = {w[0] for w in e["windows"]}
            for lb, qs in data:
                if q in qs and lb not in have:
                    e["windows"].append([lb, round(qs[q], 3)])
            if note:
                e["note"] = note
    elif cmd == "refreeze":
        assert label, "refreeze needs --label"
        for a in args:
            q, v = a.split("=", 1)
            prior = d["query_min_s"][q]
            d["query_min_s"][q] = float(v)
            e = entry(d, q)
            e["frozen_s"] = float(v)
            e.setdefault("refrozen", []).append([label, prior])
            if note:
                e["note"] = note
    elif cmd == "note":
        assert args and note, "note needs q_x --note '...'"
        for q in args:
            entry(d, q)["note"] = note
    elif cmd == "validate":
        errs = validate(d)
        for e in errs:
            print("INVALID:", e)
        print("provenance: %d entries, %s" %
              (len(d.get("provenance", {})), "OK" if not errs else "BAD"))
        return 1 if errs else 0
    else:
        print(__doc__)
        return 1

    # keep frozen_s mirrored into provenance on every write path
    for q, v in d["query_min_s"].items():
        if q in d.get("provenance", {}):
            d["provenance"][q]["frozen_s"] = v
    save(d)
    errs = validate(load())
    for e in errs:
        print("INVALID after write:", e)
    print("wrote %s: %d queries, total_s=%.1f, %d provenance entries" %
          (BASELINE, len(d["query_min_s"]), d["total_s"],
           len(d["provenance"])))
    return 1 if errs else 0


def validate(d):
    errs = []
    qm, prov = d["query_min_s"], d.get("provenance", {})
    if d["n_queries"] != len(qm):
        errs.append("n_queries != len(query_min_s)")
    if abs(d["total_s"] - sum(qm.values())) > 0.05 + 1e-9:
        errs.append("total_s != sum(query_min_s)")
    for q in qm:
        if q not in prov:
            errs.append(f"{q}: no provenance entry")
    for q, e in prov.items():
        if q not in qm:
            errs.append(f"{q}: provenance for unfrozen query")
            continue
        if e["frozen_s"] != qm[q]:
            errs.append(f"{q}: frozen_s {e['frozen_s']} != entry {qm[q]}")
        if e["n_windows"] != len(e["windows"]) or not e["windows"]:
            errs.append(f"{q}: n_windows/windows mismatch or empty")
        if e["convention"] not in CONVENTIONS:
            errs.append(f"{q}: unknown convention {e['convention']}")
        if list(e)[:2] != ["frozen_s", "n_windows"]:
            errs.append(f"{q}: key order not (frozen_s, n_windows, ...)")
        for w in e["windows"]:
            if (not isinstance(w, list) or len(w) != 2 or
                    not isinstance(w[0], str) or
                    not isinstance(w[1], (int, float))):
                errs.append(f"{q}: malformed window {w}")
    return errs


if __name__ == "__main__":
    sys.exit(main())
