"""Bench gate: compare two bench artifacts and print a verdict.

Codifies the methodology that caught the round-8 q25/q40 regression
(NOTES.md "bench gate"): single runs on this box drift ±15%/query, so a
raw per-query diff screams noise. The comparable numbers are

  1. the MEDIAN per-query ratio across the whole registry (structural
     drift of the harness/machine, should be ~1.0),
  2. the gate: queries BOTH >1.5x slower AND >0.3 s absolute slower
     (sub-100 ms noise never pages anyone),
  3. for each gate-crosser, the isolated min-of-N A/B is the final
     arbiter — this tool prints the exact command to run it.

Accepts any two bench artifacts: BENCH_DETAIL.json (full query names)
or the driver's BENCH_rNN.json (short qNN keys, nested under "parsed"
or flat). Keys are normalized to the qNN prefix so the two formats
compare. Exit 0 = gate empty (drift only), exit 1 = structural
crossers present, exit 2 = artifacts not comparable.

Usage:
  python -m tools.benchgate BENCH_r08.json .scratch/BENCH_DETAIL_latest.json
  python -m tools.benchgate --ratio-only OLD NEW   # no exit-1 on crossers
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_queries(path: str) -> tuple[dict[str, float], float | str | None]:
    with open(path) as fh:
        doc = json.load(fh)
    # driver artifact: {"parsed": {"queries": ...}} or flat {"queries": ...}
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    q = doc.get("queries")
    if not isinstance(q, dict) or not q:
        raise ValueError(f"{path}: no 'queries' dict found")
    # normalize "q01_pricing_summary" and "q01" to "q01"
    norm = {name.split("_", 1)[0]: float(sec) for name, sec in q.items()}
    if len(norm) != len(q):
        raise ValueError(f"{path}: qNN prefixes are not unique")
    return norm, doc.get("sf")


def compare(old_path: str, new_path: str) -> dict:
    old, old_sf = _load_queries(old_path)
    new, new_sf = _load_queries(new_path)
    common = sorted(set(old) & set(new), key=lambda n: int(n[1:]))
    report: dict = {
        "old": old_path,
        "new": new_path,
        "sf_match": old_sf == new_sf,
        "n_old": len(old),
        "n_new": len(new),
        "n_common": len(common),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
    }
    if not common:
        report["comparable"] = False
        return report
    report["comparable"] = True
    ratios = sorted(new[n] / old[n] for n in common if old[n] > 0)
    report["median_ratio"] = round(ratios[len(ratios) // 2], 3)
    report["total_old"] = round(sum(old[n] for n in common), 3)
    report["total_new"] = round(sum(new[n] for n in common), 3)
    crossers = {
        n: {"old": old[n], "new": new[n], "ratio": round(new[n] / old[n], 2)}
        for n in common
        if new[n] > 1.5 * old[n] and new[n] - old[n] > 0.3
    }
    improved = {
        n: {"old": old[n], "new": new[n], "ratio": round(new[n] / old[n], 2)}
        for n in common
        if old[n] > 1.5 * new[n] and old[n] - new[n] > 0.3
    }
    report["gate"] = ">1.5x AND >0.3s"
    report["crossers"] = crossers
    report["improved"] = improved
    report["verdict"] = (
        "DRIFT_ONLY"
        if not crossers
        else "STRUCTURAL_SUSPECTS (confirm each with an isolated min-of-N A/B "
        "before treating as a regression)"
    )
    return report


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", help="baseline artifact (previous round)")
    ap.add_argument("new", help="candidate artifact (this round)")
    ap.add_argument(
        "--ratio-only",
        action="store_true",
        help="always exit 0; report without gating",
    )
    args = ap.parse_args()
    try:
        report = compare(args.old, args.new)
    except (OSError, ValueError) as exc:
        print(json.dumps({"error": str(exc)}))
        return 2
    print(json.dumps(report, indent=1))
    if not report.get("comparable"):
        return 2
    for name in report["crossers"]:
        print(
            f"# isolated A/B for {name}: SPARK_GRAFT_BENCH_REPEATS=3 "
            f"python - <<'EOF'  (or re-run bench.py and read the gate's "
            f"isolated re-measure)\n"
            f"# see NOTES.md 'bench gate' - min-of-N on an idle machine is "
            f"the arbiter",
            file=sys.stderr,
        )
    if report["crossers"] and not args.ratio_only:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
