#!/usr/bin/env python3
"""Bench sanity gate: compare a fresh BENCH_DETAIL.json to the previous
round's committed one and flag unexplained per-query regressions.

Usage: python3 tools/bench_compare.py [new_detail] [old_detail] [--ratio 1.5]

A query is flagged when its min-of-2-passes time exceeds `ratio` x the
previous round's. Flagged queries should be re-run in isolation
(SPARK_GRAFT_BENCH_ONLY=<name> sbt "runMain graft.Bench") on a quiet
machine before the artifact ships -- round 8's d2/d4 "regression" was
machine contention during the driver's run, not a plan change, and this
gate is how that gets caught before it lands in a VERDICT.

Exit 0 = no flags; exit 1 = regressions listed on stdout.
"""
import json
import sys
from pathlib import Path


def load(p):
    d = json.loads(Path(p).read_text())
    return {name: q["sec"] for name, q in d["queries"].items() if q.get("ok", True)}


def main():
    argv = sys.argv[1:]
    ratio = 1.5
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--ratio"):
            if "=" in a:
                ratio = float(a.split("=", 1)[1])
            else:
                ratio = float(argv[i + 1])
                i += 1  # consume the value so it is not taken as a path
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    new_p = args[0] if len(args) > 0 else "BENCH_DETAIL.json"
    old_p = args[1] if len(args) > 1 else "BENCH_DETAIL_prev.json"
    new, old = load(new_p), load(old_p)
    # host-speed normalization: when BOTH details carry the fixed
    # single-thread machine anchor (added r13), divide per-row ratios
    # by the anchor ratio so a uniformly slower/faster host doesn't
    # read as a per-query regression (the r12 1.91x lesson).
    d_new = json.loads(Path(new_p).read_text())
    d_old = json.loads(Path(old_p).read_text())

    def stable_anchor(d):
        """Mean of the pre/post probes when they agree within 10%.

        Single-probe anchors swung +/-50% on this box across r15's
        same-box artifacts (0.295/0.447/0.33) and once produced a
        self-contradictory "0.96x raw = 1.30x normalized" pair. An
        artifact whose pre and post probes disagree was measured on a
        box that did not hold still -- its anchor calibrates nothing,
        so normalization falls back to raw and SAYS so.
        """
        pre, post = d.get("machine_anchor_sec"), d.get("machine_anchor_sec_post")
        if not pre:
            return None, "no anchor"
        if not post:
            return None, f"single-probe anchor {pre}s (pre-r16 artifact): untrusted"
        if abs(pre - post) > 0.1 * max(pre, post):
            return None, f"anchor unstable: pre {pre}s vs post {post}s (>10%)"
        return (pre + post) / 2, f"anchor stable: pre {pre}s / post {post}s"

    anchor = 1.0
    a_new, why_new = stable_anchor(d_new)
    a_old, why_old = stable_anchor(d_old)
    if a_new and a_old:
        anchor = a_new / a_old
        print(f"host anchor: {a_old:.3f}s -> {a_new:.3f}s ({anchor:.2f}x); "
              f"both stable ({why_old} | {why_new}); per-row ratios normalized by it")
    else:
        print(f"host anchor NOT used -- raw ratios only (old: {why_old}; new: {why_new})")
    flags = []
    for name in sorted(set(new) & set(old)):
        # sub-100ms queries are scheduler noise, not signal
        if old[name] >= 0.1 and new[name] / anchor > ratio * old[name]:
            flags.append((name, old[name], new[name]))
    for name, o, n in flags:
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s "
              f"({n / o:.1f}x raw, {n / o / anchor:.1f}x normalized)")
    common = set(new) & set(old)
    tn = sum(v for k, v in new.items() if k in common)
    to = sum(v for k, v in old.items() if k in common)
    print(f"== common-query total: {to:.1f}s -> {tn:.1f}s ({tn / to:.2f}x raw"
          + (f", {tn / to / anchor:.2f}x host-normalized" if anchor != 1.0 else "")
          + f"); {len(flags)} flagged of {len(set(new) & set(old))} common ==")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
