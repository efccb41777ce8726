"""Semantic invariants of the round-9 queries.

The oracle gate proves cross-engine VALUE parity; these tests pin the
BUSINESS RULES the values must satisfy — properties that would silently
survive a same-bug-both-sides edit (the one failure mode a differential
oracle cannot see). All run at sf0.001 against the registered queries.
"""

from __future__ import annotations

import pytest

from __spark_entry__ import queries

Q = queries()


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    def _run(name):
        return Q[name](spark, sf_dir).collect()

    return _run


def test_attribution_credit_is_conserved(rows):
    """Position-based attribution must hand out EXACTLY one unit of
    credit per converting session — 0.4/0.2/0.4 (and the 1- and 2-touch
    specializations) are a partition of 1.0, so total credited
    conversions across channels equals the number of distinct
    converting user-days (direct ones included)."""
    out = rows("position_based_attribution")
    total_credit = sum(r["credited_conversions"] for r in out)
    n_sessions = {}
    for r in out:
        n_sessions[r["channel"]] = r["n_sessions"]
    # distinct sessions per channel overlap (one session credits many
    # channels), so recompute the conversion count from the credit sum:
    # conservation says it must be an integer (within the 4dp rounding
    # each channel's emission carries).
    assert abs(total_credit - round(total_credit)) < 1e-2, total_credit
    assert total_credit >= max(n_sessions.values())
    # '<direct>' rows carry exactly 1.0 per session and no touches
    direct = [r for r in out if r["channel"] == "<direct>"]
    for r in direct:
        assert r["n_touches"] == 0
        assert abs(r["credited_conversions"] - r["n_sessions"]) < 1e-6


def test_gains_curve_endpoints_and_monotonicity(rows):
    """The cumulative gains curve must end at gain = 1.0 / lift = 1.0
    (decile 10 covers everyone) and be nondecreasing in gain; lift must
    be nonincreasing once past any zero-responder head deciles (score
    ordering only reorders, never loses, responders)."""
    out = sorted(rows("cumulative_gains_deciles"), key=lambda r: r["decile"])
    assert [r["decile"] for r in out] == list(range(1, 11))
    assert abs(out[-1]["gain"] - 1.0) < 1e-9
    assert abs(out[-1]["lift"] - 1.0) < 1e-9
    gains = [r["gain"] for r in out]
    assert all(a <= b + 1e-9 for a, b in zip(gains, gains[1:]))
    cum_r = [r["cum_responders"] for r in out]
    assert cum_r[-1] == sum(r["n_responders"] for r in out)


def test_abc_classes_partition_the_catalog(rows, spark, sf_dir):
    """A/B/C must partition every part that sold anything: class part
    counts sum to the revenue-bearing part count, revenue shares nest
    (A's max share <= B's min share <= ...), and C closes at share 1."""
    from pyspark.sql import functions as F

    from graph_db_spark.tables import load_table

    out = {r["abc_class"]: r for r in rows("abc_inventory_classes")}
    assert set(out) == {"A", "B", "C"}
    n_sold = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in out.values()) == n_sold
    assert out["A"]["max_cum_share"] <= 0.8 + 1e-9
    assert out["B"]["min_cum_share"] > 0.8 - 1e-4
    assert out["B"]["max_cum_share"] <= 0.95 + 1e-9
    assert abs(out["C"]["max_cum_share"] - 1.0) < 1e-9


def test_brier_decomposition_identity(rows):
    """Murphy's identity: brier = reliability - resolution + uncertainty.
    Both sides are emitted independently (each through its own round),
    so the gap is bounded by the stacked rounding, not FP luck."""
    r = rows("brier_calibration_decomposition")[0]
    assert abs(r["decomposition_check"] - r["brier"]) <= 2e-4
    assert r["reliability"] >= 0.0
    assert r["resolution"] >= 0.0
    assert 0.0 <= r["uncertainty"] <= 0.25 + 1e-9


def test_qte_quantiles_are_monotone(rows):
    """Order statistics at increasing ranks must be nondecreasing within
    each group — a wrong rank arithmetic (the grp-block offset) would
    scramble this immediately."""
    out = sorted(rows("quantile_treatment_effect"), key=lambda r: r["decile"])
    assert [r["decile"] for r in out] == list(range(1, 10))
    for col in ("q_treated", "q_control"):
        vals = [r[col] for r in out]
        assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:])), (col, vals)
    for r in out:
        assert abs(r["qte"] - round(r["q_treated"] - r["q_control"], 4)) <= 2e-4


def test_nelson_aalen_dominates_log_km_shape(rows):
    """Cumulative hazard must be strictly increasing over event times
    within a cohort, and the variance (se) nondecreasing — both are sums
    of positive terms."""
    out = rows("nelson_aalen_hazard")
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["t_days"])
        hs = [r["cum_hazard"] for r in rs]
        ses = [r["hazard_se"] for r in rs]
        assert all(a < b + 1e-9 for a, b in zip(hs, hs[1:])), cohort
        assert all(a <= b + 1e-9 for a, b in zip(ses, ses[1:])), cohort


def test_bh_rejections_are_a_prefix_of_the_p_ranking(rows):
    """BH is a STEP-UP rule: the rejected set must be exactly ranks
    1..i_max — a rejected rank above an accepted one means the step-up
    scan broke."""
    out = sorted(rows("benjamini_hochberg_fdr"), key=lambda r: r["p_rank"])
    assert [r["p_rank"] for r in out] == list(range(1, 26))
    flags = [r["rejected"] for r in out]
    # monotone nonincreasing 1s-then-0s
    assert all(a >= b for a, b in zip(flags, flags[1:])), flags
    # thresholds decrease with rank
    ths = [r["z_threshold"] for r in out]
    assert all(a > b for a, b in zip(ths, ths[1:]))


def test_filter_cascade_is_a_contraction(rows):
    """Each stage's docs_out <= docs_in, stage k+1's docs_in == stage
    k's docs_out (it is a cascade), and cumulative survival is
    nonincreasing."""
    out = sorted(rows("filter_cascade_attrition"), key=lambda r: r["stage"])
    for r in out:
        assert r["docs_out"] <= r["docs_in"]
    for prev, cur in zip(out, out[1:]):
        assert cur["docs_in"] == prev["docs_out"], (prev, cur)
    surv = [r["cum_survival"] for r in out]
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))


def test_information_gain_is_bounded_by_target_entropy(rows):
    """0 <= IG(X) <= H(Y) for every feature, and H(Y) is the same number
    on every row (it is the shared target marginal)."""
    out = rows("information_gain_split")
    hys = {r["target_entropy"] for r in out}
    assert len(hys) == 1
    hy = hys.pop()
    for r in out:
        assert -1e-9 <= r["info_gain"] <= hy + 1e-9, r
        assert abs(r["target_entropy"] - r["conditional_entropy"] - r["info_gain"]) <= 2e-4
