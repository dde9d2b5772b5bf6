"""Property fuzz: the corruption policy holds for ARBITRARY inputs.

The fixed-case tests (test_null_inputs) pin specific poisonings; this
fuzz generates random small corpora mixing clean, NULL, all-zeros, and
NaN-element vectors and asserts THREE independent implementations of
"cosine pairs >= threshold" agree exactly:

1. the expression-fold path (dedup.embedding_dup_pairs, exact tier),
2. the blocked-numpy path (similarity.embedding_pairs_blocked),
3. a pure-Python reference implementing the documented policy
   (geometry-less rows absent; left-to-right fold dot; HALF_UP round).

Spark-session-per-example is too slow for hypothesis, so examples are
generated up front and replayed through one session in a single test —
the repo's differential-test convention, fuzz-shaped.
"""

from __future__ import annotations

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from ncpi_whistler_spark.operators.dedup import embedding_dup_pairs
from ncpi_whistler_spark.operators.similarity import embedding_pairs_blocked


def _gen_corpus(rnd: random.Random, n: int, dim: int):
    rows = []
    for i in range(n):
        kind = rnd.choice(
            ["clean", "clean", "clean", "null", "zero", "nan", "nullelem"]
        )
        if kind == "null":
            rows.append((i, None))
        elif kind == "nullelem":
            # a NULL ELEMENT folds to a NULL norm — three-valued logic
            # territory (the review-caught semantic_dedup drop class)
            v = [rnd.uniform(-1, 1) for _ in range(dim)]
            v[rnd.randrange(dim)] = None
            rows.append((i, v))
        elif kind == "zero":
            rows.append((i, [0.0] * dim))
        elif kind == "nan":
            v = [rnd.uniform(-1, 1) for _ in range(dim)]
            v[rnd.randrange(dim)] = float("nan")
            rows.append((i, v))
        else:
            rows.append((i, [rnd.uniform(-1, 1) for _ in range(dim)]))
    return rows


def _py_reference(rows, threshold):
    """The documented policy, independently: NULL / zero-norm /
    NaN-element vectors score no pair; fold dot left-to-right; round
    HALF_UP to 6 like both engines' ROUND."""

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    usable = {}
    for i, v in rows:
        if v is None or any(x is None for x in v):
            continue
        nrm = math.sqrt(fold_dot(v, v))
        if nrm > 0 and not math.isnan(nrm):
            usable[i] = (v, nrm)
    out = set()
    ids = sorted(usable)
    for ai in ids:
        for bi in ids:
            if ai >= bi:
                continue
            (va, na), (vb, nb) = usable[ai], usable[bi]
            sim = fold_dot(va, vb) / (na * nb)
            if not math.isnan(sim) and sim >= threshold:
                r = float(
                    Decimal(repr(sim)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                )
                out.add((ai, bi, r))
    return out


def test_corruption_policy_three_way_agreement(spark):
    rnd = random.Random(20260815)
    for case in range(12):
        n = rnd.randrange(2, 25)
        dim = rnd.randrange(2, 9)
        threshold = rnd.choice([-0.5, 0.0, 0.3, 0.7, 0.95])
        rows = _gen_corpus(rnd, n, dim)
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        want = _py_reference(rows, threshold)
        fold = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in embedding_dup_pairs(df, threshold=threshold).collect()
        }
        blocked = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in embedding_pairs_blocked(df, threshold=threshold).collect()
        }
        assert fold == want, f"case {case}: expression path diverged"
        assert blocked == want, f"case {case}: numpy path diverged"
