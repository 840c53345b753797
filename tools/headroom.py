#!/usr/bin/env python3
"""Emit the per-round scale-headroom artifact (HEADROOM_r{N}.json).

Usage: python3 tools/headroom.py <round> [n_worst] [--skip-sf1-build]

1. Picks the N most expensive queries from BENCH_DETAIL.json (the
   committed per-row bench), plus any queries named in WATCHLIST —
   rows whose scale behavior past rounds flagged as worth re-checking.
2. Rebuilds tmp/sf1 (10x sf0.1) via make_sf1.py unless present and
   --skip-sf1-build given.
3. One sbt runMain graft.Headroom invocation times every picked row at
   sf0.1 and sf1 (warm second pass, one JVM) -> HEADROOM_r{N}.json.
"""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# rows with documented nonlinear contracts or past flags — always timed
WATCHLIST = ["d5_embedding_dedup", "q15_percentiles", "m4_binary_simhash",
             "a3_approx_quantiles", "q4_running_window",
             # r12 flags re-checked post-fix: capped evaluators (should
             # now be ~linear) and the codec-bound m-family rows
             "d16_lsh_recall_eval", "s17_nprobe_sweep", "s9_ann_recall",
             "d20_containment", "s10_sim_histogram",
             "m12_image_resize", "m13_image_ahash_dedup",
             "m15_gif_frame_dedup",
             # r13's new rows: codec-bound m-family + the two heaviest
             # new relational rows
             "m16_pixel_roundtrip", "m17_audio_dedup", "m18_scene_cuts",
             "t37_dup_fraction", "d24_jaccard_calibration",
             # r15 changes re-checked at 10x: q45 gained a 4th range-
             # partition sort key (rev tiebreak), a13 a bigger theta
             # nominal, d8 its first oracle (operator unchanged)
             "q45_running_revenue", "a13_theta_diff", "d8_embedding_lsh",
             # r16's new row: per-config band joins + one truth scan;
             # expected ~linear in N per config
             "s21_mih_band_sweep",
             # r17's new rows: the lake-building matview probe (write-
             # bound, expected ~linear) and the banded radius search
             # (posting-mass-bound, expected ~linear)
             "q59_matview_rollup", "s22_hamming_radius",
             # r18's new rows: the URL family's shuffling members
             # (u2: fingerprint + domain groupBys; u3: canon groupBy —
             # both expected ~linear; u1 is map-only and not listed)
             "u2_domain_rollup", "u3_canon_collapse"]


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    rnd = pos[0] if len(pos) > 0 else "12"
    n_worst = int(pos[1]) if len(pos) > 1 else 10
    detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
    times = {q: r["sec"] if isinstance(r, dict) else r
             for q, r in detail["queries"].items()}
    worst = sorted(times, key=lambda q: -times[q])[:n_worst]
    picked = list(dict.fromkeys(worst + [w for w in WATCHLIST if w in times]))

    sf1 = REPO / "tmp" / "sf1"
    if not (sf1.exists() and "--skip-sf1-build" in sys.argv):
        subprocess.run([sys.executable, str(REPO / "tools" / "make_sf1.py")],
                       check=True, cwd=REPO)

    out = REPO / f"HEADROOM_r{rnd}.json"
    args = " ".join([str(out), "/root/testdata/sf0.1", str(sf1)] + picked)
    subprocess.run(["sbt", "-batch", f"runMain graft.Headroom {args}"],
                   check=True, cwd=REPO)
    print(out.read_text())


if __name__ == "__main__":
    main()
