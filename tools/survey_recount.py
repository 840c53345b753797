#!/usr/bin/env python3
"""Scripted recount of SURVEY.md's coverage claims.

Checks, loudly and exactly (exit 1 on any mismatch):
1. Each §2 subsection's declared row count ("; N rows)") equals the
   number of table rows actually present in that subsection.
2. The §2 header arithmetic ("Per-section totals: a + b + ... = T")
   matches the recounted per-section numbers and their sum.
3. The LATEST round-status sentence's driver-suite split ("D queries
   = O DuckDB-hash-matched oracles + R documented rows-only") matches
   the latest CORRECTNESS_r*.json artifact: D = total entries,
   O = entries with err == null (hash-compared), R = entries with
   err == "no_oracle". (The r15 verdict caught this drifting by one
   after d8's rows-only -> oracle conversion; the old recount checked
   only the 265-row table sum.)
4. The rows-only LEDGER split (r17 verdict item 4): every SURVEY row
   whose verification cell says "rows-only" must be tagged PERMANENT
   with a one-line reason, or it counts as "convertible remaining";
   a SURVEY rows-only claim on a row the latest artifact already
   hash-checks is a stale-SURVEY error; artifact rows-only keys the
   SURVEY now marks oracle are reported as converted-since-artifact
   (legitimate one-round lag). The OK line reports
   "N permanent + M convertible remaining".

Run from the repo root: python3 tools/survey_recount.py
"""
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def fail(msgs):
    for m in msgs:
        print(f"RECOUNT FAIL: {m}")
    sys.exit(1)


def main():
    text = (ROOT / "SURVEY.md").read_text()
    errs = []

    # --- 1. per-subsection declared vs actual table rows ---
    sections = re.findall(
        r"^### (§2\.\d [^\n]*?(\d+) rows\)\n)(.*?)(?=^### |^## |\Z)",
        text, re.M | re.S)
    if len(sections) < 6:
        errs.append(f"found only {len(sections)} §2 subsections with a 'N rows)' header")
    counts = []
    for header, declared, body in sections:
        # table rows: lines starting with "| key" content, minus the
        # header row ("| key |...") and the separator ("| --- |...")
        rows = [l for l in body.splitlines()
                if l.startswith("|") and not l.startswith("| ---")
                and not l.lower().startswith("| key")]
        counts.append(len(rows))
        if len(rows) != int(declared):
            errs.append(f"{header.strip()}: declares {declared} rows, table has {len(rows)}")

    # --- 2. header arithmetic ---
    m = re.search(r"Per-section totals: ([\d +]+)\n?= (\d+) rows", text)
    if not m:
        errs.append("missing 'Per-section totals: ... = N rows' line in §2 header")
    else:
        declared_parts = [int(x) for x in m.group(1).split("+")]
        declared_total = int(m.group(2))
        if declared_parts != counts:
            errs.append(f"header parts {declared_parts} != recounted {counts}")
        if sum(counts) != declared_total:
            errs.append(f"header total {declared_total} != recounted sum {sum(counts)}")

    # --- 3. latest round-status split vs latest CORRECTNESS artifact ---
    artifacts = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    if not artifacts:
        errs.append("no CORRECTNESS_r*.json artifact found")
        fail(errs)
    latest = artifacts[-1]
    data = json.loads(latest.read_text())
    total = len(data)
    rows_only = sum(1 for v in data.values() if v.get("err") == "no_oracle")
    oracles = sum(1 for v in data.values() if v.get("err") is None)
    statuses = re.findall(
        r"Round-\d+ status:.*?(\d+)\s*\n?queries = (\d+) DuckDB-hash-matched oracles \+ (\d+) documented\s*\n?rows-only",
        text, re.S)
    if not statuses:
        errs.append("no 'Round-N status: ... D queries = O ... + R ...' sentence found")
    else:
        d, o, r = (int(x) for x in statuses[-1])
        # The artifact lags the working tree by up to one round (the
        # driver writes it at round close); a LARGER declared suite is
        # legitimate mid-round growth, a different split at the SAME
        # size is the drift this check exists to catch.
        if d == total and (o != oracles or r != rows_only):
            errs.append(
                f"latest round-status split {o} oracles + {r} rows-only != "
                f"{latest.name}'s {oracles} + {rows_only}")
        if d != o + r:
            errs.append(f"round-status split {o} + {r} != declared suite size {d}")
        if d < total:
            errs.append(
                f"round-status declares {d} driver queries but {latest.name} has {total}")

    # --- 4. rows-only ledger: permanent vs convertible ---
    survey_ro = {}  # key -> verification cell
    for _, _, body in sections:
        for l in body.splitlines():
            if not l.startswith("|") or l.startswith("| ---") or l.lower().startswith("| key"):
                continue
            cells = [c.strip() for c in l.strip().strip("|").split("|")]
            if len(cells) >= 2 and "rows-only" in cells[-1]:
                survey_ro[cells[0]] = cells[-1]
    permanent = {k for k, c in survey_ro.items() if "PERMANENT:" in c}
    convertible = sorted(set(survey_ro) - permanent)
    artifact_ro = {k for k, v in data.items() if v.get("err") == "no_oracle"}
    # stale SURVEY: claims rows-only but the artifact hash-checks it
    for k in sorted(survey_ro):
        if k in data and data[k].get("err") is None:
            errs.append(f"SURVEY marks {k} rows-only but {latest.name} hash-checks it")
    converted = sorted(artifact_ro - set(survey_ro))
    if converted:
        print(f"RECOUNT INFO: converted since {latest.name}: {', '.join(converted)}")
    if convertible:
        print(f"RECOUNT INFO: convertible rows-only remaining: {', '.join(convertible)}")

    if errs:
        fail(errs)
    print(f"RECOUNT OK: sections {counts} sum {sum(counts)}; "
          f"{latest.name}: {total} queries = {oracles} oracles + {rows_only} rows-only; "
          f"ledger: {len(permanent)} permanent + {len(convertible)} convertible remaining")


if __name__ == "__main__":
    main()
