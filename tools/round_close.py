#!/usr/bin/env python3
"""One-command round-close ritual (VERDICT r16 item 8).

Runs, SEQUENTIALLY and in dependency order, every per-round evidence
step that used to be manual, cross-checks each one, and writes a
single ROUND_CLOSE_r{N}.json scorecard:

  1. quiet-box check        (1-min load; timing steps lie on a busy host)
  2. dress rehearsal        (full sf0.1 bench, min-of-2 -> BENCH_DETAIL.json,
                             anchors must agree within 10%; FIRST, on the
                             coldest box — the r18 close measured a 12%
                             diffuse inflation when this ran an hour into
                             the sequence, unreproducible once isolated)
  3. bench compare          (tools/bench_compare.py vs BENCH_DETAIL_prev.json;
                             flags demand isolated adjudication, not a pass)
  4. headroom               (tools/headroom.py {N} --skip-sf1-build)
  5. sbt test               (full spec suite; --skip-tests to skip)
  6. sf0.01 oracle gate     (tools/verify_local.py, expect 0 fail; also
                             cross-checks the rehearsal covered every
                             gate query)
  7. sf1 oracle replay      (QC_SAMPLE_PCT=2, expect 0 fail / 0 timeout;
                             builds tmp/sf1 via make_sf1.py if absent)
  8. survey recount         (tools/survey_recount.py)
  9. ingest gates           (graft.IngestGateBench -> INGEST_GATES_r{N}.json;
                             ratio-based — each row vs itself at other
                             scales in one JVM — so load-robust, stays late)
 10. stream state           (graft.StreamStateBench -> STREAM_STATE_r{N}.json)
 11. pin                    (only with --pin AND steps 2-3 clean:
                             BENCH_DETAIL.json -> BENCH_DETAIL_prev.json)

Usage: python3 tools/round_close.py <round> [--skip-tests] [--skip-sf1]
           [--skip-bench] [--pin] [--max-load=1.0]

Any step failing marks the scorecard red and exits 1; later steps
still run (the scorecard should show everything that needs fixing)
except steps that depend on a failed precondition. Timing steps
(2-4, 9-10) are refused outright on a busy box — transient host
contention has fabricated 10-16x per-row inflation before
(BENCH_NOTES_r15 §5).
"""
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def sh(cmd, env=None, timeout=7200):
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    p = subprocess.run(cmd, cwd=REPO, env=e, timeout=timeout,
                       capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr, round(time.time() - t0, 1)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if not args:
        print("usage: round_close.py <round> [--skip-tests] [--skip-sf1] "
              "[--skip-bench] [--pin] [--max-load=N]")
        sys.exit(2)
    rnd = int(args[0])
    max_load = 1.0
    for f in flags:
        if f.startswith("--max-load"):
            if "=" not in f:
                print("round_close.py: use --max-load=N (e.g. --max-load=1.5); "
                      "the space-separated form is not supported")
                sys.exit(2)
            max_load = float(f.split("=", 1)[1])
    steps = {}
    failed = []
    ran = set()  # steps that actually executed (not skipped by flag/busy box)

    def record(name, ok, info, secs=None, did_run=True):
        steps[name] = {"ok": ok, "info": info, **({"sec": secs} if secs else {})}
        if did_run:
            ran.add(name)
        print(f"[round_close] {'OK  ' if ok else 'FAIL'} {name}: {info}")
        if not ok:
            failed.append(name)

    # 1. quiet box — timing artifacts are only valid on an idle host
    load1 = os.getloadavg()[0]
    quiet = load1 <= max_load
    record("quiet_box", quiet, f"1-min load {load1:.2f} (max {max_load})")

    # 2-4. TIMING-SENSITIVE steps run FIRST, on the coldest box.
    # The r18 close ran the dress rehearsal ~1h into the sequence
    # (after sbt test, the 36-min sf1 replay and two bench JVMs) and
    # measured a 12% diffuse inflation over 93 rows that an
    # immediate same-HEAD re-run on the then-quiet box could not
    # reproduce (125.2s vs the 125.8s pin, 0 flagged — BENCH_NOTES_r18
    # §3). Absolute-time compares are only trustworthy at the front of
    # the ritual; the correctness steps are insensitive to load and
    # absorb the late-sequence heat instead. The ratio-based timing
    # artifacts (ingest gates, stream state) stay late: they compare a
    # row against itself at other scales within one JVM.
    rehearsal_nq = None
    if not quiet:
        for name in ("dress_rehearsal", "bench_compare", "headroom"):
            record(name, False, "SKIPPED: busy box — timing would be untrusted")
    elif "--skip-bench" in flags:
        record("dress_rehearsal", True, "SKIPPED by flag", did_run=False)
        record("bench_compare", True, "SKIPPED by flag", did_run=False)
        record("headroom", True, "SKIPPED by flag", did_run=False)
    else:
        # 2. dress rehearsal: full sf0.1 min-of-2 -> BENCH_DETAIL.json
        rc, out, secs = sh(
            ["sbt", "-batch", "runMain graft.Bench"],
            env={"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
                 "SPARK_GRAFT_BENCH_PASSES": "2"}, timeout=7200)
        detail = json.loads((REPO / "BENCH_DETAIL.json").read_text()) \
            if (REPO / "BENCH_DETAIL.json").exists() else {}
        a0 = detail.get("machine_anchor_sec")
        a1 = detail.get("machine_anchor_sec_post")
        anchors_ok = bool(a0 and a1 and
                          abs(a0 - a1) / max(a0, a1) <= 0.10)
        rehearsal_nq = len(detail.get("queries", {}))
        n_bad = sum(1 for q in detail.get("queries", {}).values()
                    if not q.get("ok", True))
        record("dress_rehearsal",
               rc == 0 and anchors_ok and n_bad == 0,
               f"{rehearsal_nq} rows, {n_bad} failed, anchors {a0}/{a1} "
               f"({'stable' if anchors_ok else 'DIVERGENT >10%'})", secs)

        # 3. compare vs pin (flags demand adjudication, not auto-fail:
        # still recorded as not-ok so the scorecard forces a look)
        rc, out, secs = sh(["python3", "tools/bench_compare.py"])
        record("bench_compare", rc == 0, out.strip().splitlines()[-1]
               if out.strip() else "no output", secs)

        # 4. headroom at 10x
        rc, out, secs = sh(
            ["python3", "tools/headroom.py", str(rnd), "--skip-sf1-build"],
            timeout=7200)
        record("headroom", rc == 0, f"HEADROOM_r{rnd}.json", secs)

    # 5. full spec suite
    if "--skip-tests" in flags:
        record("sbt_test", True, "SKIPPED by flag", did_run=False)
    else:
        rc, out, secs = sh(["sbt", "-batch", "test"], timeout=3600)
        m = re.search(r"Tests: succeeded (\d+), failed (\d+)", out)
        # sbt prints one line per suite; take totals from the final summary
        m2 = re.search(r"Passed: Total (\d+), Failed (\d+)", out)
        total, nfail = (m2.group(1), m2.group(2)) if m2 else \
            ((m.group(1), m.group(2)) if m else ("?", "?"))
        record("sbt_test", rc == 0 and nfail == "0",
               f"{total} specs, {nfail} failed", secs)

    # 6. sf0.01 oracle gate
    rc, out, secs = sh(["python3", "tools/verify_local.py"], timeout=3600)
    m = re.search(r"== (\d+) pass, (\d+) fail ==", out)
    record("gate_sf001", rc == 0 and m and m.group(2) == "0",
           m.group(0) if m else out[-300:], secs)
    gate_pass = int(m.group(1)) if m else 0
    # Cross-check the (already-run) rehearsal covered every gate query:
    # a rehearsal that silently dropped rows must not satisfy the pin.
    if rehearsal_nq is not None and rehearsal_nq < gate_pass and \
            steps.get("dress_rehearsal", {}).get("ok"):
        steps["dress_rehearsal"]["ok"] = False
        steps["dress_rehearsal"]["info"] += \
            f" — BUT only {rehearsal_nq} rows vs {gate_pass} gate passes"
        failed.append("dress_rehearsal")

    # 7. sf1 oracle replay (sampled quadratic family)
    if "--skip-sf1" in flags:
        record("replay_sf1", True, "SKIPPED by flag", did_run=False)
    else:
        if not (REPO / "tmp/sf1/documents.parquet").exists():
            rc, out, secs = sh(["python3", "tools/make_sf1.py"], timeout=3600)
            if rc != 0:
                record("replay_sf1", False, f"make_sf1 failed: {out[-300:]}")
        if "replay_sf1" not in steps:
            rc, out, secs = sh(
                ["python3", "tools/verify_local.py", "tmp/sf1",
                 "/tmp/graft_sf1_close", "--oracle-timeout", "900"],
                env={"SPARK_GRAFT_QC_SAMPLE_PCT": "2",
                     "SPARK_GRAFT_CPUS": "32"}, timeout=7200)
            m = re.search(r"== (\d+) pass, (\d+) fail ==", out)
            n_to = len(re.findall(r"TIMEOUT", out))
            ok = rc == 0 and m and m.group(2) == "0" and n_to == 0
            record("replay_sf1", ok,
                   (m.group(0) if m else out[-300:]) + f", {n_to} timeouts", secs)

    # 8. survey recount (artifact may lag one round; recount allows growth)
    rc, out, secs = sh(["python3", "tools/survey_recount.py"])
    record("survey_recount", rc == 0, out.strip()[-200:], secs)

    timing_ok = quiet
    if not timing_ok:
        for name in ("ingest_gates", "stream_state"):
            record(name, False, "SKIPPED: busy box — timing would be untrusted")
    else:
        # 9. ingest gates
        rc, out, secs = sh(
            ["sbt", "-batch", f"runMain graft.IngestGateBench "
             f"INGEST_GATES_r{rnd}.json /root/testdata/sf0.01 "
             f"/root/testdata/sf0.1 tmp/sf1"], timeout=3600)
        record("ingest_gates", rc == 0, f"INGEST_GATES_r{rnd}.json", secs)

        # 10. streaming state evidence
        rc, out, secs = sh(
            ["sbt", "-batch", f"runMain graft.StreamStateBench STREAM_STATE_r{rnd}.json"],
            timeout=3600)
        m = re.search(r'"flat_state_rows":(\w+).*?"mem_bounded_slack_1p5x":(\w+)',
                      out, re.S)
        ok = rc == 0 and m and m.group(1) == "true" and m.group(2) == "true"
        record("stream_state", ok,
               f"flat_rows={m.group(1) if m else '?'} mem_bounded={m.group(2) if m else '?'}",
               secs)

    # 11. re-pin only on a rehearsal+compare that actually RAN clean
    # this round — a step skipped by flag (or busy box) must not
    # satisfy the pin gate, else a stale BENCH_DETAIL.json silently
    # overwrites the baseline future compares trust.
    if "--pin" in flags:
        if "dress_rehearsal" in ran and "bench_compare" in ran and \
           steps.get("dress_rehearsal", {}).get("ok") and \
           steps.get("bench_compare", {}).get("ok"):
            (REPO / "BENCH_DETAIL_prev.json").write_text(
                (REPO / "BENCH_DETAIL.json").read_text())
            record("pin", True, "BENCH_DETAIL.json -> BENCH_DETAIL_prev.json")
        else:
            why = "skipped (did not run)" if (
                "dress_rehearsal" not in ran or "bench_compare" not in ran
            ) else "not clean"
            record("pin", False,
                   f"refused: rehearsal/compare {why} — adjudicate/re-run first")

    out_path = REPO / f"ROUND_CLOSE_r{rnd}.json"
    out_path.write_text(json.dumps(
        {"round": rnd, "ok": not failed, "failed_steps": failed,
         "steps": steps}, indent=1))
    print(f"[round_close] scorecard: {out_path.name} "
          f"({'ALL OK' if not failed else 'FAILED: ' + ', '.join(failed)})")
    sys.exit(0 if not failed else 1)


if __name__ == "__main__":
    main()
