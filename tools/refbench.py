"""Head-to-head extraction throughput: the REFERENCE's row-at-a-time
ObjectifyCSV (wstlr/extractor.py) vs this engine's scan→aggregate→display
DataFrame plan, on an identical synthetic survey CSV.

The reference publishes no benchmark numbers (BASELINE.md), so this is the
"matches-or-beats the reference's single-node throughput" evidence: same
input, same logical output (row objects with aggregated entries + display
columns — parity proven separately by tests/test_differential.py), wall
time per side. The reference side is pure in-memory iteration (no JSON
serialization — favorable to the reference); the engine side pays the full
Spark plan including the noop sink.

Usage: PYTHONPATH=/root/repo python tools/refbench.py [rows] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import types

REFERENCE = "/root/reference"


def _import_reference():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    for name, attrs in [("ncpi_fhir_client", ["fhir_auth"]), ("rich", ["print"])]:
        try:
            __import__(name)
            continue
        except ImportError:
            pass
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, print if a == "print" else types.SimpleNamespace())
        sys.modules[name] = m
    # wstlr/bundle.py needs rich.progress.track; stub it as the identity
    # iterator (REAL rich adds per-item progress overhead, so the stub
    # favors the reference side of the bundle head-to-head)
    try:
        from rich.progress import track  # noqa: F401
    except ImportError:
        prog = types.ModuleType("rich.progress")
        prog.track = lambda it, *a, **k: it
        sys.modules["rich.progress"] = prog
        sys.modules["rich"].progress = prog
    from wstlr.extractor import BuildAggregators, GroupBy, ObjectifyCSV

    return BuildAggregators, GroupBy, ObjectifyCSV


def _write_csv(path: str, rows: int) -> None:
    meds = [f"med_{m}" for m in ("aspirin", "statin", "metformin", "lisinopril")]
    syms = [f"sym_{s}" for s in ("fever", "cough", "fatigue")]
    with open(path, "w") as fh:
        fh.write("Subject ID,Visit,Age (years)," + ",".join(meds + syms) + "\n")
        for i in range(rows):
            med_vals = [str((i * 7 + j) % 400) if (i + j) % 3 else "NA" for j in range(len(meds))]
            sym_vals = ["yes" if (i + j) % 2 else "no" for j in range(len(syms))]
            fh.write(f"P{i},V{i % 4},{20 + i % 60}," + ",".join(med_vals + sym_vals) + "\n")


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    BuildAggregators, GroupBy, ObjectifyCSV = _import_reference()

    aggs = {"medications": "^med_", "symptoms": "^sym_"}
    code_details = {"81": "81 milligrams", "yes": "present", "V1": "Visit one"}

    tmp = tempfile.mkdtemp()
    csv_path = os.path.join(tmp, "survey.csv")
    _write_csv(csv_path, rows)

    # --- reference: row-at-a-time Python ---
    ref_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        with open(csv_path) as fh:
            out = ObjectifyCSV(
                fh,
                aggregators=BuildAggregators(aggs),
                grouper=GroupBy(None),
                agg_splitter="_",
                code_details=code_details,
            )
            n_ref = len(out)
        ref_times.append(time.perf_counter() - t0)
    ref_sec = min(ref_times)

    # --- engine: DataFrame plan (warm session, full plan incl. sink) ---
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ncpi_whistler_spark import get_spark
    from ncpi_whistler_spark.operators.aggregators import aggregate_columns
    from ncpi_whistler_spark.operators.harmonize import add_display_columns
    from ncpi_whistler_spark.sources.csv_source import scan_csv

    spark = get_spark(app_name="refbench")
    scan_csv(spark, csv_path).count()  # warm JVM + file listing
    eng_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = scan_csv(spark, csv_path)
        df = aggregate_columns(df, aggs, splitter="_", code_details=code_details)
        df = add_display_columns(df, ["subject_id", "visit"], code_details)
        df.write.format("noop").mode("overwrite").save()
        eng_times.append(time.perf_counter() - t0)
    eng_sec = min(eng_times)
    n_eng = df.count()

    assert n_ref == n_eng == rows, (n_ref, n_eng, rows)

    # --- second head-to-head: harmony CSV → ConceptMap compile ---
    # (wstlr/conceptmap.py BuildConceptMap vs sources/harmony.ConceptMap;
    # edge-set parity is proven by tests/test_differential.py — this
    # measures wall time on a mapping table `cm_rows` long.)
    cm_rows = max(1000, rows // 4)
    harmony_path = os.path.join(tmp, "harmony.csv")
    with open(harmony_path, "w") as fh:
        fh.write("local code,text,local code system,code,display,code system\n")
        for i in range(cm_rows):
            sys_i = i % 50
            fh.write(
                f"lc{i},Text {i},system{sys_i},tc{i % 997},Display {i},"
                f"http://example.org/cs/{sys_i}\n"
            )
    from wstlr.conceptmap import BuildConceptMap

    ref_cm_times = []
    for _ in range(reps):
        out_json = os.path.join(tmp, "harmony.json")
        t0 = time.perf_counter()
        BuildConceptMap([harmony_path], {}, name_prefix="t", outname=out_json)
        ref_cm_times.append(time.perf_counter() - t0)
    ref_cm_sec = min(ref_cm_times)

    from ncpi_whistler_spark.sources.harmony import ConceptMap

    eng_cm_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cm = ConceptMap.from_csv(spark, harmony_path)
        cm.codings_df().write.format("noop").mode("overwrite").save()
        eng_cm_times.append(time.perf_counter() - t0)
    eng_cm_sec = min(eng_cm_times)

    # --- third head-to-head: whistle-output bundle JSON ingest ---
    # (wstlr/bundle.py ParseBundle — json.load + per-resource consumer
    # loop, serial over files — vs sources/json_source.read_bundle_json,
    # a JVM-side multiLine JSON read parallel ACROSS files + explode.
    # Resource-for-resource parity is proven by tests/test_differential;
    # here both sides additionally produce the same per-resourceType
    # counts, asserted below. rich's per-item progress iterator is
    # stubbed to identity, favoring the reference.)
    n_files = 8
    n_bundle_resources = max(8000, rows // 2)
    per_file = n_bundle_resources // n_files
    bundle_dir = os.path.join(tmp, "bundles")
    os.makedirs(bundle_dir)
    for f_i in range(n_files):
        patients = [
            {
                "resourceType": "Patient",
                "id": f"p{f_i}-{i}",
                "gender": "female" if i % 2 else "male",
                "identifier": [{"system": "urn:study", "value": f"P{f_i}-{i}"}],
            }
            for i in range(per_file // 4)
        ]
        observations = [
            {
                "resourceType": "Observation",
                "id": f"o{f_i}-{i}",
                "status": "final",
                "code": {"coding": [{"system": "urn:v", "code": f"v{i % 37}"}]},
                "valueQuantity": {"value": float(i % 400), "unit": "mg"},
                "subject": {"reference": f"Patient/p{f_i}-{i % (per_file // 4)}"},
            }
            for i in range(per_file - per_file // 4)
        ]
        with open(os.path.join(bundle_dir, f"bundle_{f_i}.json"), "w") as fh:
            json.dump({"patient": patients, "observation": observations}, fh)

    from wstlr.bundle import ParseBundle

    bundle_files = sorted(
        os.path.join(bundle_dir, f) for f in os.listdir(bundle_dir)
    )
    ref_counts: dict = {}
    ref_bp_times = []
    for _ in range(reps):
        counts: dict = {}

        def consumer(group, resource):
            rt = resource.get("resourceType", "")
            counts[rt] = counts.get(rt, 0) + 1

        t0 = time.perf_counter()
        for fp in bundle_files:
            with open(fp) as fh:
                ParseBundle(fh, [consumer])
        ref_bp_times.append(time.perf_counter() - t0)
        ref_counts = counts
    ref_bp_sec = min(ref_bp_times)

    from pyspark.sql import functions as F

    from ncpi_whistler_spark.sources.json_source import read_bundle_json

    eng_counts: dict = {}
    eng_bp_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        eng_counts = {
            r["resourceType"]: r["n"]
            for r in read_bundle_json(spark, bundle_dir)
            .groupBy("resourceType")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        eng_bp_times.append(time.perf_counter() - t0)
    eng_bp_sec = min(eng_bp_times)
    assert eng_counts == ref_counts, (eng_counts, ref_counts)

    print(
        json.dumps(
            {
                "rows": rows,
                "reference_sec": round(ref_sec, 3),
                "engine_sec": round(eng_sec, 3),
                "reference_rows_per_sec": round(rows / ref_sec),
                "engine_rows_per_sec": round(rows / eng_sec),
                "speedup": round(ref_sec / eng_sec, 2),
                "conceptmap": {
                    "rows": cm_rows,
                    "reference_sec": round(ref_cm_sec, 3),
                    "engine_sec": round(eng_cm_sec, 3),
                    "speedup": round(ref_cm_sec / eng_cm_sec, 2),
                },
                "bundle_parse": {
                    "resources": n_bundle_resources,
                    "files": n_files,
                    "reference_sec": round(ref_bp_sec, 3),
                    "engine_sec": round(eng_bp_sec, 3),
                    "speedup": round(ref_bp_sec / eng_bp_sec, 2),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
