"""Semantic invariants of the round-10 queries.

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


def test_isotonic_fit_is_monotone_and_mean_preserving(rows):
    """The PAV/minimax fit must be (1) nondecreasing in the discount
    bin, (2) inside the raw-rate envelope, and (3) weighted-mean
    preserving (sum n*iso == sum n*raw — pooling only averages within
    blocks, it never creates or destroys mass)."""
    out = sorted(rows("isotonic_calibration_pav"), key=lambda r: r["disc_pct"])
    iso = [r["rate_iso"] for r in out]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:])), iso
    raws = [r["rate_raw"] for r in out]
    assert min(raws) - 1e-4 <= min(iso) and max(iso) <= max(raws) + 1e-4
    total = sum(r["n"] for r in out)
    mean_raw = sum(r["n"] * r["rate_raw"] for r in out) / total
    mean_iso = sum(r["n"] * r["rate_iso"] for r in out) / total
    # each emission is 4dp-rounded; the means differ by at most that
    assert abs(mean_raw - mean_iso) < 2e-4, (mean_raw, mean_iso)


def test_mann_kendall_s_bounds_and_z_sign(rows):
    """|S| is bounded by the number of pairs, the variance is positive
    for any nondegenerate series, and the continuity-corrected z must
    carry S's sign (or be 0 at S in {-1, 0, 1})."""
    (r,) = rows("mann_kendall_trend")
    n, s = r["n"], r["s_stat"]
    assert abs(s) <= n * (n - 1) // 2
    assert r["var_s"] > 0
    if s > 1:
        assert r["z"] > 0
    elif s < -1:
        assert r["z"] < 0


def test_friedman_ranks_partition_and_q_nonnegative(rows):
    """Mean ranks live in [1, k]; their sum is exactly k(k+1)/2 = 15
    (every block hands out ranks 1..5 once, ties as averages); Q >= 0
    and df = k-1 = 4."""
    out = rows("friedman_priority_ranks")
    assert len(out) == 5
    for r in out:
        assert 1.0 - 1e-9 <= r["mean_rank"] <= 5.0 + 1e-9
        assert r["q_stat"] >= 0
        assert r["df"] == 4
    assert abs(sum(r["mean_rank"] for r in out) - 15.0) < 5e-4
    assert len({r["q_stat"] for r in out}) == 1  # shared statistic


def test_logrank_chi2_replays_from_components(rows):
    """The emitted chi2 must equal (O1-E1)^2/V recomputed from the
    emitted components (within the 4dp rounding each carries), and the
    hypergeometric variance is nonnegative."""
    (r,) = rows("logrank_cohort_test")
    assert r["variance"] >= 0
    if r["variance"] > 0:
        expect = (r["observed_view"] - r["expected_view"]) ** 2 / r["variance"]
        assert abs(expect - r["chi2"]) < 5e-2 * max(1.0, r["chi2"])


def test_cuped_correlation_consistency(rows):
    """rho^2 must equal corr_xy^2 (same moments), |corr| <= 1, the
    variance reduction lives in [0, 1], and CUPED only ever shifts the
    raw difference by theta * (pre-period imbalance) — with a parity
    split the imbalance is small, so the adjusted diff stays finite and
    same-order."""
    (r,) = rows("cuped_variance_reduction")
    assert abs(r["corr_xy"]) <= 1.0 + 1e-9
    assert -1e-9 <= r["var_reduction"] <= 1.0 + 1e-9
    assert abs(r["var_reduction"] - r["corr_xy"] ** 2) < 5e-4
    assert r["n_treat"] > 0 and r["n_ctrl"] > 0


def test_skyline_rows_are_mutually_nondominated(rows):
    """No skyline row may dominate another row of the same brand
    (<= on both size and price, < on one) — the defining property —
    and every brand keeps at least its cheapest part."""
    out = rows("pareto_skyline_parts")
    by_brand: dict[str, list] = {}
    for r in out:
        by_brand.setdefault(r["brand"], []).append(r)
    assert by_brand, "empty skyline"
    for brand, rs in by_brand.items():
        for x in rs:
            for y in rs:
                if x is y:
                    continue
                dominated = (
                    y["size"] <= x["size"]
                    and y["price"] <= x["price"]
                    and (y["size"] < x["size"] or y["price"] < x["price"])
                )
                assert not dominated, (brand, x, y)


def test_skyline_contains_each_brands_cheapest_part(rows, spark, sf_dir):
    from pyspark.sql import functions as F

    from graph_db_spark.tables import load_table

    part = load_table(spark, sf_dir, "part")
    cheapest = {
        r["p_brand"]: r["mc"]
        for r in part.groupBy("p_brand")
        .agg(F.min(F.round(F.col("p_retailprice") * 100).cast("bigint")).alias("mc"))
        .collect()
    }
    out = rows("pareto_skyline_parts")
    got = {}
    for r in out:
        c = round(r["price"] * 100)
        got[r["brand"]] = min(got.get(r["brand"], c), c)
    for brand, mc in cheapest.items():
        assert got.get(brand) == mc, (brand, mc, got.get(brand))


def test_flesch_linearity_identity(rows):
    """Flesch is LINEAR in the two per-doc ratios, so the group average
    must replay from the emitted average ratios: avg_flesch = 206.835
    - 1.015*avg_wps - 84.6*avg_spw (each emission 4dp-rounded)."""
    out = rows("flesch_reading_ease")
    assert out, "no groups"
    for r in out:
        expect = (
            206.835
            - 1.015 * r["avg_words_per_sentence"]
            - 84.6 * r["avg_syllables_per_word"]
        )
        assert abs(expect - r["avg_flesch"]) < 2e-2, r
        assert r["avg_words_per_sentence"] >= 1.0 - 1e-9
        assert 0 <= r["n_very_hard"] <= r["n_docs"]


def test_hodges_lehmann_shift_within_pairwise_envelope(rows, spark, sf_dir):
    """The HL estimator is a median of pairwise differences, so it must
    lie inside [min(u)-max(l), max(u)-min(l)] recomputed from the daily
    cent series it is defined over."""
    from pyspark.sql import functions as F

    from graph_db_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")

    def bounds(prio):
        r = (
            o.filter(F.col("o_orderpriority") == prio)
            .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c")
            )
            .agg(F.min("c").alias("lo"), F.max("c").alias("hi"))
            .collect()[0]
        )
        return r["lo"] / 100.0, r["hi"] / 100.0

    ulo, uhi = bounds("1-URGENT")
    llo, lhi = bounds("5-LOW")
    (r,) = rows("hodges_lehmann_shift")
    assert ulo - lhi - 1e-6 <= r["hl_shift"] <= uhi - llo + 1e-6
    assert ulo <= r["median_urgent"] <= uhi
    assert llo <= r["median_low"] <= lhi


def test_fisher_is_geometric_mean_and_indices_positive(rows):
    out = rows("price_index_fisher")
    assert out, "no index years"
    for r in out:
        assert r["year"] >= 1996
        assert r["n_parts"] > 0
        assert r["laspeyres"] > 0 and r["paasche"] > 0
        expect = (r["laspeyres"] * r["paasche"]) ** 0.5
        assert abs(expect - r["fisher"]) < 5e-4, r


def test_eb_shrinkage_contracts_toward_the_prior(rows):
    """Partial pooling must (1) keep every posterior rate inside the raw
    envelope, (2) never increase cross-group dispersion (shrinkage is a
    contraction), and (3) keep weight_data in (0, 1]."""
    out = rows("empirical_bayes_shrinkage")
    raws = [r["rate_raw"] for r in out]
    shrunk = [r["rate_shrunk"] for r in out]
    lo, hi = min(raws) - 1e-4, max(raws) + 1e-4
    assert all(lo <= s <= hi for s in shrunk)
    for r in out:
        assert 0 < r["weight_data"] <= 1.0 + 1e-9

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    assert var(shrunk) <= var(raws) + 1e-12


# --- batch 2 ---------------------------------------------------------------


def test_wilcoxon_w_bounds_and_z_sign(rows):
    """W+ lives in [0, n(n+1)/2]; z carries the sign of W+ - mu (the
    normal-approximation center n(n+1)/4)."""
    (r,) = rows("wilcoxon_signed_rank")
    n, w = r["n_pairs"], r["w_plus"]
    assert n > 0
    assert 0.0 <= w <= n * (n + 1) / 2.0
    mu = n * (n + 1) / 4.0
    if w > mu + 1:
        assert r["z_stat"] > 0
    elif w < mu - 1:
        assert r["z_stat"] < 0


def test_durbin_watson_range_and_rho_replay(rows):
    """DW is bounded in [0, 4]; rho_approx must replay as 1 - DW/2
    within the 4dp rounding both carry."""
    (r,) = rows("durbin_watson_trend")
    assert r["n_days"] > 100
    assert 0.0 <= r["dw_stat"] <= 4.0
    assert abs(r["rho_approx"] - (1.0 - r["dw_stat"] / 2.0)) < 2e-4


def test_max_drawdown_bounds(rows):
    """Drawdown is a fraction of the running peak: [0, 1). The first day
    is its own peak, so underwater_days < n_days."""
    (r,) = rows("max_drawdown_daily")
    assert 0.0 <= r["max_drawdown"] < 1.0
    assert 0 <= r["underwater_days"] < r["n_days"]


def test_chao1_and_ace_never_below_observed(rows):
    """Richness estimators add unseen mass — they can never fall below
    the observed vocabulary (Chao1 by construction; ACE because
    Srare/Crare >= Srare when Crare <= 1)."""
    (r,) = rows("chao1_vocab_richness")
    d = r["vocab_observed"]
    assert d > 0 and r["singletons"] >= 0 and r["doubletons"] >= 0
    assert r["chao1_estimate"] >= d - 1e-6
    if r["ace_estimate"] is not None:
        assert r["ace_estimate"] >= d - 1e-4


def test_cmh_statistic_and_or_positive(rows):
    """One stratum per region (5), chi2 >= 0, and the MH common odds
    ratio is positive for any table with nonempty off-diagonals."""
    (r,) = rows("cmh_return_rate")
    assert r["n_strata"] == 5
    assert r["n_total"] > 0
    assert r["cmh_chi2"] >= 0
    assert r["mh_odds_ratio"] > 0


# --- batch 3 ---------------------------------------------------------------


def test_shapley_efficiency_axiom(rows, spark, sf_dir):
    """Σφ over the 4 channels must equal v(full) − v(∅): total
    conversions minus conversions of channel-untouched users (the
    efficiency axiom — the whole point of Shapley over heuristics)."""
    out = rows("shapley_channel_attribution")
    assert len(out) == 4
    total_phi = sum(r["shapley_conversions"] for r in out)
    from graph_db_spark.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    peru = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") != "purchase", 1).otherwise(0)
        ).alias("touched"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    agg = peru.agg(
        F.sum("conv").alias("all_conv"),
        F.sum(F.col("conv") * (1 - F.col("touched"))).alias("untouched"),
    ).collect()[0]
    expect = agg["all_conv"] - agg["untouched"]
    assert abs(total_phi - expect) < 4 * 5e-5 + 1e-9, (total_phi, expect)


def test_wasserstein_bounds(rows):
    """W1 is nonnegative, at least |mean difference| (Jensen), and the
    quantization width is positive."""
    (r,) = rows("wasserstein_price_shift")
    assert r["quant_width_cents"] >= 1
    assert r["w1_dollars"] >= 0
    assert r["w1_dollars"] >= abs(r["mean_diff_dollars"]) - 1e-3
    assert r["n_urgent"] > 0 and r["n_low"] > 0


def test_negbin_moments_consistency(rows):
    """dispersion_ratio must replay as var/mean; nb_r only exists when
    overdispersed and is then positive; zero fractions live in [0,1]."""
    (r,) = rows("negbin_overdispersion")
    assert abs(r["dispersion_ratio"] - r["var_orders"] / r["mean_orders"]) < 1e-2
    if r["nb_r"] is not None:
        assert r["dispersion_ratio"] > 1
        assert r["nb_r"] > 0
    for c in ("zero_frac_obs", "zero_frac_poisson"):
        assert 0.0 <= r[c] <= 1.0


def test_engle_granger_phi_is_contraction(rows):
    """The DF coefficient on a mean-reverting spread lies in (-2, 0]
    (phi = 0 is a pure random walk, phi <= -2 would oscillate
    divergently), and adf_t carries phi's sign."""
    (r,) = rows("engle_granger_cointegration")
    assert r["n_days"] > 10  # sf0.001 has ~32 days with both series
    assert -2.0 < r["phi"] <= 0.5  # small positive noise tolerated
    if r["phi"] < -0.01:
        assert r["adf_t"] < 0


def test_weibull_fit_positive_and_median_replay(rows):
    """Shape and scale are positive; the emitted median must replay as
    scale * ln2^(1/shape) within rounding."""
    (r,) = rows("weibull_time_to_convert")
    assert r["n_points"] > 3
    assert r["weibull_shape"] > 0
    assert r["weibull_scale_days"] > 0
    expect = r["weibull_scale_days"] * 0.6931471805599453 ** (
        1.0 / r["weibull_shape"]
    )
    assert abs(expect - r["median_days"]) < 5e-3 * max(1.0, r["median_days"])


# --- batch 4 ---------------------------------------------------------------


def test_bray_curtis_metric_properties(rows):
    """BC lives in [0, 1], the pair matrix is the upper triangle of the
    20-source grid, and shared_tokens > 0 for same-domain sources."""
    out = rows("bray_curtis_source_matrix")
    assert 0 < len(out) <= 20 * 19 // 2
    for r in out:
        assert r["source_a"] < r["source_b"]
        assert 0.0 <= r["bray_curtis"] <= 1.0
        assert r["shared_tokens"] > 0


def test_hurst_exponent_plausible_range(rows):
    """When enough full blocks exist, H of any real series lies in
    (0, 1); a degenerate grid emits NULL rather than a junk slope."""
    (r,) = rows("hurst_exponent_rs")
    assert r["n_days"] > 0
    if r["hurst_h"] is not None:
        assert r["n_scales"] >= 2
        assert -0.5 < r["hurst_h"] < 1.5  # slope of ln(R/S), wide guard
    else:
        assert r["n_scales"] < 2 or r["blocks_used"] == 0


def test_auc_probability_bounds_and_gini_replay(rows):
    """AUC is a probability; gini must replay as 2*AUC - 1."""
    (r,) = rows("auc_doc_length_lang")
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert 0.0 <= r["auc"] <= 1.0
    assert abs(r["gini_coefficient"] - (2 * r["auc"] - 1)) < 2e-4


# --- batch 5 ---------------------------------------------------------------


def test_burstiness_and_memory_bounds(rows):
    """B lives in [-1, 1] by construction (sigma, mu >= 0); M is a
    correlation in [-1, 1]; gaps are nonnegative so the mean is too."""
    (r,) = rows("interevent_burstiness_memory")
    assert r["n_gaps"] > 0
    assert r["mean_gap_s"] >= 0
    if r["burstiness_b"] is not None:
        assert -1.0 - 1e-9 <= r["burstiness_b"] <= 1.0 + 1e-9
    if r["memory_m"] is not None:
        assert -1.0 - 1e-9 <= r["memory_m"] <= 1.0 + 1e-9
        assert r["n_pairs"] > 1


def test_effect_sizes_internally_consistent(rows):
    """|g| < |d| (the correction shrinks), d and glass share sign, and
    var_ratio is positive."""
    (r,) = rows("effect_size_priority")
    assert r["n_treat"] > 1 and r["n_ctrl"] > 1
    assert abs(r["hedges_g"]) <= abs(r["cohens_d"]) + 1e-9
    if abs(r["cohens_d"]) > 1e-3:
        assert r["cohens_d"] * r["glass_delta"] > 0
    assert r["var_ratio"] > 0


def test_mrr_hit_monotonicity(rows):
    """hit@1 <= hit@5 <= hit@10, each in [0,1]; MRR is bounded by
    hit@1 <= MRR <= hit@10 (reciprocal ranks are <= 1 and > 1/10...
    precisely: mrr >= hit@1 * 1 and mrr <= hit@10)."""
    out = rows("mrr_hit_at_k")
    assert out, "no classes"
    for r in out:
        assert 0.0 <= r["hit_at_1"] <= r["hit_at_5"] + 1e-9
        assert r["hit_at_5"] <= r["hit_at_10"] + 1e-9 and r["hit_at_10"] <= 1.0
        assert r["hit_at_1"] - 1e-4 <= r["mrr_10"] <= r["hit_at_10"] + 1e-4
        assert r["n_queries"] > 0


# --- batch 6 ---------------------------------------------------------------


def test_relative_risk_cis_bracket_the_estimates(rows):
    """Point estimates must lie inside their own CIs; OR and RR share a
    direction; all four cells are nonempty for this fixture design."""
    (r,) = rows("relative_risk_ci")
    for cell in ("n_exposed_ret", "n_exposed_ok", "n_unexposed_ret",
                 "n_unexposed_ok"):
        assert r[cell] > 0
    assert r["or_lo"] <= r["odds_ratio"] <= r["or_hi"]
    assert r["rr_lo"] <= r["risk_ratio"] <= r["rr_hi"]
    assert (r["odds_ratio"] - 1) * (r["risk_ratio"] - 1) >= -1e-4


def test_huber_mean_between_median_and_raw_mean(rows):
    """Winsorizing pulls the mean toward the median: the Huber estimate
    must lie between the median and the raw mean (inclusive, within
    rounding), and clipping must touch a minority of rows."""
    (r,) = rows("huber_onestep_location")
    lo = min(r["median_dollars"], r["raw_mean_dollars"]) - 1e-3
    hi = max(r["median_dollars"], r["raw_mean_dollars"]) + 1e-3
    assert lo <= r["huber_mean_dollars"] <= hi
    assert 0 <= r["n_clipped"] < r["n_orders"] / 2
    assert r["mad_dollars"] > 0


# --- batch 7 ---------------------------------------------------------------


def test_ipf_raking_hits_both_margins(rows):
    """After 3 rounds the column margins are matched exactly (the last
    update is a column scale) and the row margins to IPF tolerance;
    weights are positive and sum to ~1."""
    out = rows("ipf_raking_margins")
    assert out
    tot = sum(r["weight_raked"] for r in out)
    assert abs(tot - 1.0) < 5e-3
    cols: dict[str, float] = {}
    for r in out:
        assert r["weight_raked"] > 0
        cols[r["priority"]] = cols.get(r["priority"], 0.0) + r["weight_raked"]
    for prio, w in cols.items():
        assert abs(w - 0.2) < 1e-3, (prio, w)


def test_ab_power_consistency(rows):
    """abs_lift must replay from the rates; the planned n is positive
    when a lift exists; z_excess > 0 iff the current sample is already
    significant (cross-checked against the planned-n comparison)."""
    (r,) = rows("ab_power_sample_size")
    assert abs(r["abs_lift"] - (r["rate_treat"] - r["rate_ctrl"])) < 2e-4
    if r["n_per_arm_80pct"] is not None:
        assert r["n_per_arm_80pct"] > 0
        have = min(r["n_treat"], r["n_ctrl"])
        # if we already have far more than the planned n, the current
        # z must clear significance (power at the planned n is 80%)
        if have > 4 * r["n_per_arm_80pct"]:
            assert r["z_excess"] > 0


# --- batch 8 ---------------------------------------------------------------


def test_page_hinkley_nonnegative_and_day_in_range(rows):
    """PH is a max of nonnegative deviations (PH_t >= 0 with equality
    only for a monoting-up series); the trough day must parse as a
    date within the fixture calendar."""
    (r,) = rows("page_hinkley_drift")
    assert r["n_days"] > 0
    assert r["ph_max_dollars"] >= 0
    assert r["trough_day"] is None or r["trough_day"][:2] in ("19", "20")


def test_granger_f_nonnegative_and_r2_consistent(rows):
    """Adding a regressor never raises RSS, so F >= 0 and the partial
    R^2 lives in [0, 1)."""
    (r,) = rows("granger_causality_f")
    assert r["n_days"] > 10
    assert r["granger_f"] >= -1e-6
    assert -1e-6 <= r["partial_r2"] < 1.0


# --- batch 9 ---------------------------------------------------------------


def test_taylor_law_slope_plausible(rows):
    """The prefactor is positive and the slope finite; at sf0.001 the
    (brand x day) cells are mostly k=1 so the mean range is tiny and
    the log-log slope is legitimately unstable (9.9 observed) — only a
    wide sanity bound holds across SFs."""
    (r,) = rows("taylors_power_law")
    assert r["n_brands"] > 2
    if r["taylor_b"] is not None:
        assert -20.0 < r["taylor_b"] < 20.0
        assert r["taylor_a"] > 0


def test_hhi_bounds_and_effective_competitors(rows):
    """HHI in (0, 10000]; 1/HHI (share-space) is at most n_brands and
    at least 1."""
    out = rows("concentration_hhi")
    assert out
    for r in out:
        assert 0 < r["hhi_points"] <= 10000 + 1e-6
        assert 1.0 - 1e-6 <= r["effective_competitors"] <= r["n_brands"] + 1e-6


def test_weekly_dft_amplitude_nonnegative_phase_in_range(rows):
    """Amplitude >= 0, phase in (-pi, pi], and the relative amplitude
    is a fraction of the mean for any non-degenerate series."""
    (r,) = rows("weekly_cycle_dft")
    assert r["n_days"] > 0
    assert r["weekly_amplitude_dollars"] >= 0
    assert -3.1416 <= r["phase_rad"] <= 3.1416
    assert r["amplitude_over_mean"] >= 0
