"""Property fuzz: CDC merge semantics hold for ARBITRARY change logs.

test_cdc pins hand-built cases; this fuzz generates random change logs
(random key overlap with the base, random version depths, duplicate
seqs, NULL keys/values, interleaved deletes/upserts, empty extremes)
and asserts the engine's merge_upsert agrees EXACTLY with a pure-Python
dict model of the documented semantics:

  winner(key)  = max by (seq, tiebreaker-struct-of-payload) — the
                 deterministic orderable-payload path
  'D' winner   = key absent from the result
  other winner = payload replaces/creates the key's row
  base rows with untouched keys pass through unchanged
  NULL delta keys never match any base key (SQL join semantics): the
  NULL-keyed winner inserts; NULL-keyed base rows always pass through

Also fuzzes scd2_history against a model (sorted versions per key,
lead-closed intervals). One Spark session replays all generated
examples — the repo's fuzz convention (hypothesis-per-example would
pay session startup per case).
"""

from __future__ import annotations

import random

from ncpi_whistler_spark.operators.cdc import merge_upsert, scd2_history

N_CASES = 25
_NULL = ("__null__",)  # sentinel for a NULL key in the model


def _gen_case(rnd: random.Random):
    base_keys = rnd.sample(range(1, 15), rnd.randint(0, 8))
    base = [
        (k, f"b{k}", float(k)) for k in base_keys
    ]
    if rnd.random() < 0.3:
        base.append((None, "bnull", -1.0))
    delta = []
    delta_keys = rnd.sample(range(1, 20), rnd.randint(0, 10))
    for k in delta_keys:
        for _ in range(rnd.randint(1, 4)):
            seq = rnd.randint(1, 5)  # duplicate seqs likely
            op = rnd.choice(["U", "U", "U", "D", "I"])
            val = None if rnd.random() < 0.1 else f"d{k}s{seq}{op}"
            delta.append((k, val, rnd.choice([float(seq), None]), seq, op))
    if rnd.random() < 0.3:
        delta.append((None, "dnull", 9.9, 1, "U"))
    rnd.shuffle(delta)
    return base, delta


def _model_merge(base, delta):
    """Pure-Python model of merge_upsert's documented semantics."""

    def ordkey(row):
        k, v, amt, seq, op = row
        # seq first, then the full payload struct — Spark struct
        # comparison with NULLs-first on ascending max? Spark's max()
        # treats NULL struct FIELDS as smaller than any value (NULLS
        # FIRST in ascending order => max prefers non-null). Model:
        # (seq, field-wise (is-not-null, value)) lexicographic.
        def f(x, caster=str):
            return (0, "") if x is None else (1, caster(x))

        return (seq, f(v), f(amt, float), f(op))

    winners = {}
    for row in delta:
        key = _NULL if row[0] is None else row[0]
        if key not in winners or ordkey(row) > ordkey(winners[key]):
            winners[key] = row
    out = []
    for k, v, amt in base:
        mk = _NULL if k is None else k
        if k is None or mk not in winners:
            out.append((k, v, amt))
    for key, (k, v, amt, seq, op) in winners.items():
        if op != "D":
            out.append((k, v, amt))
    return sorted(out, key=repr)


def test_fuzz_merge_matches_model(spark):
    rnd = random.Random(90210)
    for case in range(N_CASES):
        base_rows, delta_rows = _gen_case(rnd)
        base = spark.createDataFrame(
            base_rows or [(0, "x", 0.0)], "k int, v string, amt double"
        )
        if not base_rows:
            base = base.where("k < 0")
        delta = spark.createDataFrame(
            delta_rows or [(0, "x", 0.0, 1, "U")],
            "k int, v string, amt double, __seq int, __op string",
        )
        if not delta_rows:
            delta = delta.where("k < 0")
        got = sorted(
            ((r["k"], r["v"], r["amt"]) for r in
             merge_upsert(base, delta, ["k"], "__seq", op_col="__op").collect()),
            key=repr,
        )
        want = _model_merge(base_rows, delta_rows)
        assert got == want, f"case {case}: {got} != {want}\nbase={base_rows}\ndelta={delta_rows}"


def test_fuzz_scd2_matches_model(spark):
    rnd = random.Random(1337)
    for case in range(N_CASES):
        rows = []
        for k in rnd.sample(range(1, 10), rnd.randint(1, 6)):
            for seq in rnd.sample(range(0, 9), rnd.randint(1, 5)):
                rows.append((k, seq, f"v{k}.{seq}"))
        rnd.shuffle(rows)
        df = spark.createDataFrame(rows, "k int, seq int, v string")
        got = {
            (r["k"], r["seq"]): (r["valid_from_seq"], r["valid_to_seq"], r["is_current"])
            for r in scd2_history(df, ["k"], "seq").collect()
        }
        want = {}
        byk: dict[int, list[int]] = {}
        for k, seq, _ in rows:
            byk.setdefault(k, []).append(seq)
        for k, seqs in byk.items():
            seqs.sort()
            for i, s in enumerate(seqs):
                nxt = seqs[i + 1] if i + 1 < len(seqs) else None
                want[(k, s)] = (s, nxt, nxt is None)
        assert got == want, f"case {case}"
