"""Tests for the bounded-state sketch/screen operators added in round 4b:

* HyperLogLog distinct-shingle sketch  (textstats.hll_distinct_shingles)
* Bloom-filter incremental screen      (dedup.dedup_bloom_screen)
* unigram log-likelihood scoring       (textstats.unigram_loglik)
* histogram quantile sketch            (textstats.length_quantile_sketch)

Cross-engine value equality is covered by the oracle mirror
(test_queries_oracle.py); these tests pin the parts an oracle can't:
estimator accuracy vs exact, the no-false-negative Bloom guarantee on a
fixture that actually exercises every branch (including a searched-for
genuine false positive), model-scoring semantics, and the physical
plans the 100-TB story depends on."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from local_pdftodocx_ocr_spark.operators import dedup, textstats
from local_pdftodocx_ocr_spark.plans import asserts as plans

SF_DIR = "/root/testdata/sf0.01"


class TestHLLSketch:
    def test_estimate_within_hll_error_bound(self, spark):
        """m=256 registers -> ~1.04/sqrt(256) = 6.5% standard error;
        allow 15% (2+ sigma) against the exact distinct-shingle count."""
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        exact = dedup._distinct_shingles(d).select("s").distinct().count()
        row = textstats.hll_distinct_shingles(spark, SF_DIR).collect()[0]
        rel_err = abs(row["est_distinct_shingles"] - exact) / exact
        assert rel_err < 0.15, (row["est_distinct_shingles"], exact)

    def test_small_range_correction_branch(self, spark):
        """A tiny corpus must take the linear-counting branch (zeros>0)
        and still land within the bound — both branches are live."""
        rows = [(i, f"alpha beta gamma delta {i}") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        orig = textstats._docs
        try:
            textstats._docs = lambda spark, sf: df
            row = textstats.hll_distinct_shingles(spark, SF_DIR).collect()[0]
        finally:
            textstats._docs = orig
        # 5 tokens/doc -> 3 shingles: two shared across all docs
        # ("alpha beta gamma", "beta gamma delta") + one unique
        # ("gamma delta {i}") = 2 + 30 distinct
        exact = 32
        assert row["n_zero_registers"] > 0
        est = row["est_distinct_shingles"]
        # linear counting is very accurate at n << m
        assert abs(est - exact) / exact < 0.15, (est, exact)

    def test_per_source_estimates_within_bound(self, spark):
        """The grouped sketch must estimate each source's distinct
        shingles as accurately as the global one (same m per group)."""
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        sh = dedup._distinct_shingles(
            d.withColumn("doc_id", F.col("source")))   # reuse: key by source
        exact = {r["doc_id"]: r["n"] for r in
                 sh.distinct().groupBy("doc_id")
                 .agg(F.count("*").alias("n")).collect()}
        got = {r["source"]: r["est_distinct_shingles"] for r in
               textstats.hll_by_source(spark, SF_DIR).collect()}
        assert set(got) == set(exact)
        for src, est in got.items():
            assert abs(est - exact[src]) / exact[src] < 0.2, \
                (src, est, exact[src])

    def test_empty_corpus_estimates_zero(self, spark):
        """Zero shingle-bearing docs -> every register empty -> the
        linear-counting branch must yield est 0.0, not NULL (SUM over
        zero register rows is NULL without the COALESCE)."""
        df = spark.createDataFrame([(0, "one two")],  # < 3 tokens: no shingles
                                   "doc_id long, text string")
        orig = textstats._docs
        try:
            textstats._docs = lambda spark, sf: df
            row = textstats.hll_distinct_shingles(spark, SF_DIR).collect()[0]
        finally:
            textstats._docs = orig
        assert row["n_zero_registers"] == textstats.HLL_M
        assert row["est_distinct_shingles"] == 0.0

    def test_plan_is_bounded_aggregation(self, spark):
        """The sketch must be two hash aggregations (bucket max ->
        single-row fold), never a distinct/sort on the full shingle
        stream, and JVM-only."""
        df = textstats.hll_distinct_shingles(spark, SF_DIR)
        plan = plans.executed_plan(df)
        assert "Sort" not in plan, plan
        assert "EvalPython" not in plan, plan


class TestBloomScreen:
    """Planted fixture: 600 committed docs fill ~25% of the 8192-bit
    filter; incoming rows include an exact duplicate (maybe & dup), a
    SEARCHED-FOR genuine false positive (maybe & not dup — trial 7 of
    the deterministic probe family), and fresh texts (not maybe). A
    pure-Python mirror of the md5 bit arithmetic is the oracle."""

    M, K = dedup.BLOOM_M, dedup.BLOOM_K

    @classmethod
    def _key(cls, text: str) -> str:
        return hashlib.md5(text.lower().encode()).hexdigest()

    @classmethod
    def _pos(cls, key: str, i: int) -> int:
        return int(hashlib.md5(
            (key + f"bloom{i}").encode()).hexdigest()[:15], 16) % cls.M

    @pytest.fixture()
    def planted(self, spark, tmp_path):
        committed = [f"committed document number {j} about spark shuffle "
                     "and parquet tables" for j in range(600)]
        incoming = (
            [committed[17], committed[99]]            # true duplicates
            + ["fresh probe text candidate 7"]        # searched false positive
            + [f"genuinely new text {j} nothing like the rest"
               for j in range(40)])
        rows = ([(2 * j, t) for j, t in enumerate(committed)]
                + [(2 * j + 1, t) for j, t in enumerate(incoming)])
        path = str(tmp_path / "docs")
        spark.createDataFrame(rows, "doc_id long, text string") \
             .withColumn("lang", F.lit("en")) \
             .withColumn("source", F.lit("src0")) \
             .withColumn("n_chars", F.length("text")) \
             .write.parquet(f"{path}/documents.parquet")
        return path, committed, incoming

    def test_matches_python_mirror_and_hits_every_branch(self, spark, planted):
        path, committed, incoming = planted
        bits = {self._pos(self._key(t), i)
                for t in committed for i in range(self.K)}
        keys = {self._key(t) for t in committed}
        expect = {2 * j + 1: (all(self._pos(self._key(t), i) in bits
                                  for i in range(self.K)),
                              self._key(t) in keys)
                  for j, t in enumerate(incoming)}
        got = {r["doc_id"]: (r["maybe_dup"], r["is_dup"])
               for r in dedup.dedup_bloom_screen(spark, path).collect()}
        assert got == expect
        outcomes = set(got.values())
        assert (True, True) in outcomes      # real duplicate screened in
        assert (True, False) in outcomes     # the planted false positive
        assert (False, False) in outcomes    # fresh doc screened out
        # no false negatives, ever: every true dup must be maybe_dup
        assert all(maybe for maybe, dup in got.values() if dup)

    def test_filter_is_broadcast_and_bounded(self, spark):
        df = dedup.dedup_bloom_screen(spark, SF_DIR)
        plan = plans.executed_plan(df)
        assert "BroadcastHashJoin" in plan, plan
        assert "EvalPython" not in plan, plan

    def test_incremental_bloom_equals_plain_anti_join(self, spark, planted):
        """The bloom-backed keep list must be row-identical to the plain
        anti-join incremental dedup — on the sf corpus AND on the
        planted fixture whose false positive forces the verify join to
        actually overrule the screen (the FP doc is fresh and must
        survive into the keep list)."""
        path, _, _ = planted
        for src in (SF_DIR, path):
            plain = {tuple(r) for r in
                     dedup.dedup_incremental(spark, src).collect()}
            bloom = {tuple(r) for r in
                     dedup.dedup_incremental_bloom(spark, src).collect()}
            assert bloom == plain, (src, len(plain), len(bloom))
        # the planted FP's key is present in the keep list (it is fresh)
        fp_key = self._key("fresh probe text candidate 7")
        keys = {r["content_key"] for r in
                dedup.dedup_incremental_bloom(spark, path).collect()}
        assert fp_key in keys

    def test_fp_rate_matches_fill_factor(self, spark, planted):
        """~25% fill, k=4 -> FP rate ~0.4%; the 40 fresh docs should
        essentially never collide except the planted one."""
        path, _, _ = planted
        out = dedup.dedup_bloom_screen(spark, path).collect()
        false_pos = [r for r in out if r["maybe_dup"] and not r["is_dup"]]
        assert len(false_pos) == 1    # exactly the searched-for fixture


class TestUnigramLoglik:
    def test_common_tokens_score_higher(self, spark):
        rows = [(0, "spark spark spark spark spark spark spark spark"),
                (1, "spark spark spark spark spark spark spark xyzzy")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        orig = textstats._docs
        try:
            textstats._docs = lambda spark, sf: df
            got = {r["doc_id"]: r["avg_log2_prob"]
                   for r in textstats.unigram_loglik(spark, SF_DIR).collect()}
        finally:
            textstats._docs = orig
        assert got[0] > got[1], got
        # model check: doc0 is pure 'spark' (tf=15 of N=16, V=2):
        # log2(16/18) per token
        assert got[0] == pytest.approx(
            round(round(math.log2(16 / 18) * 10000) / 10000.0, 4), abs=1e-9)

    def test_scores_negative_and_complete(self, spark):
        out = textstats.unigram_loglik(spark, SF_DIR).collect()
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert len(out) == n_docs
        assert all(r["avg_log2_prob"] < 0 for r in out)

    def test_tokenless_docs_still_emitted(self, spark):
        """A document with no non-empty tokens (empty / all-space text)
        must surface as (n_tokens=0, avg NULL) rather than vanish —
        downstream inner joins would silently lose it."""
        rows = [(0, "alpha beta gamma"), (1, ""), (2, "   ")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        orig = textstats._docs
        try:
            textstats._docs = lambda spark, sf: df
            got = {r["doc_id"]: (r["n_tokens"], r["avg_log2_prob"])
                   for r in textstats.unigram_loglik(spark, SF_DIR).collect()}
        finally:
            textstats._docs = orig
        assert set(got) == {0, 1, 2}
        assert got[1] == (0, None) and got[2] == (0, None)
        assert got[0][0] == 3 and got[0][1] < 0

    def test_plan_jvm_only_no_forced_vocab_broadcast(self, spark):
        """The vocabulary table scales with the corpus: the tf join must
        NOT carry a forced broadcast hint (AQE decides); the only forced
        broadcast is the 1-row totals."""
        df = textstats.unigram_loglik(spark, SF_DIR)
        plan = plans.executed_plan(df)
        assert "EvalPython" not in plan, plan
        from local_pdftodocx_ocr_spark.operators.textstats import unigram_loglik
        import inspect
        src = inspect.getsource(unigram_loglik)
        assert src.count("F.broadcast") == 1  # totals only


class TestCurriculumPhases:
    def test_phase_boundaries_are_minimal_tertile_covers(self, spark):
        """early = all docs in bins up to the FIRST bin whose cumulative
        count reaches ceil(N/3); likewise early+mid for ceil(2N/3) —
        i.e. each prefix covers its tertile rank, and removing the
        boundary bin would uncover it (minimality)."""
        out = textstats.curriculum_phases(spark, SF_DIR).collect()
        n = len(out)
        r1, r2 = -(-n // 3), -(-2 * n // 3)
        by_phase = {p: [r["qbin"] for r in out if r["phase"] == p]
                    for p in ("early", "mid", "late")}
        assert all(by_phase.values()), {p: len(v) for p, v in by_phase.items()}
        # phases are ordered by quality bin
        assert max(by_phase["early"]) < min(by_phase["mid"])
        assert max(by_phase["mid"]) < min(by_phase["late"])
        n_early = len(by_phase["early"])
        n_mid = len(by_phase["mid"])
        b1, b2 = max(by_phase["early"]), max(by_phase["mid"])
        assert n_early >= r1                      # covers the tertile rank
        assert n_early + n_mid >= r2
        in_b1 = sum(1 for q in by_phase["early"] if q == b1)
        in_b2 = sum(1 for q in by_phase["mid"] if q == b2)
        assert n_early - in_b1 < r1               # minimal cover
        assert n_early + n_mid - in_b2 < r2

    def test_matches_exact_quality_ordering(self, spark):
        """Phase assignment must be monotone in the exact quality score:
        no early doc outscores any late doc."""
        q = {r["doc_id"]: r["quality"]
             for r in textstats.quality_score(spark, SF_DIR).collect()}
        phases = {r["doc_id"]: r["phase"]
                  for r in textstats.curriculum_phases(spark, SF_DIR).collect()}
        max_early = max(q[d] for d, p in phases.items() if p == "early")
        min_late = min(q[d] for d, p in phases.items() if p == "late")
        assert max_early < min_late


class TestTokenEntropy:
    def test_known_distributions(self, spark):
        """Degenerate text -> 0 bits; all-distinct -> log2(N); a 50/50
        two-token doc -> exactly 1 bit; token-less docs surface as
        (0, 0, NULL)."""
        import math

        rows = [(0, "a a a a a a a a"),
                (1, "a b c d e f g h"),
                (2, "x x y y"),
                (3, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        orig = textstats._docs
        try:
            textstats._docs = lambda spark, sf: df
            got = {r["doc_id"]: (r["n_tokens"], r["n_distinct"],
                                 r["entropy_bits"])
                   for r in textstats.token_entropy(spark, SF_DIR).collect()}
        finally:
            textstats._docs = orig
        assert got[0] == (8, 1, 0.0)
        assert got[1] == (8, 8, 3.0)          # log2(8)
        assert got[2] == (4, 2, 1.0)
        assert got[3] == (0, 0, None)
        assert math.isclose(got[1][2], math.log2(8))

    def test_bounds_on_corpus(self, spark):
        """0 <= H <= log2(n_distinct) for every doc, and repetitive
        docs score strictly below all-distinct ones of the same
        length."""
        import math

        out = textstats.token_entropy(spark, SF_DIR).collect()
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert len(out) == n_docs
        for r in out:
            if r["n_tokens"]:
                assert -1e-4 <= r["entropy_bits"] \
                    <= math.log2(max(r["n_distinct"], 1)) + 1e-4, dict(r)


class TestLengthQuantileSketch:
    def test_monotone_and_correct_thresholds(self, spark):
        out = {r["pct"]: r for r in
               textstats.length_quantile_sketch(spark, SF_DIR).collect()}
        n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        for p in textstats.HIST_PCTS:
            assert out[p]["rank_at"] == -(-n * p // 100)   # ceil
        assert (out[50]["est_chars_ub"] <= out[90]["est_chars_ub"]
                <= out[99]["est_chars_ub"])

    def test_estimate_brackets_exact_quantile(self, spark):
        """est_chars_ub is the upper edge of the bin holding the rank-q
        value: exact quantile in (est - BIN, est]."""
        lens = sorted(r["n_chars"] for r in spark.read.parquet(
            f"{SF_DIR}/documents.parquet").select("n_chars").collect())
        out = {r["pct"]: r["est_chars_ub"] for r in
               textstats.length_quantile_sketch(spark, SF_DIR).collect()}
        for p in textstats.HIST_PCTS:
            exact = lens[-(-len(lens) * p // 100) - 1]
            assert out[p] - textstats.HIST_BIN_CHARS < exact <= out[p], \
                (p, exact, out[p])

    def test_overflow_bin_reports_corpus_max(self, spark):
        """Docs beyond the histogram range land in the capped bin; its
        upper edge must be the EXACT corpus max, keeping est_chars_ub a
        true upper bound (the capped edge alone would report 2048 for
        any longer corpus)."""
        rows = [(i, "x", 100 + i) for i in range(90)] + \
               [(90 + j, "y", 5000 + j) for j in range(10)]   # >> 127*16
        df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
        orig = textstats._docs
        try:
            textstats._docs = lambda spark, sf: df
            out = {r["pct"]: r["est_chars_ub"] for r in
                   textstats.length_quantile_sketch(spark, SF_DIR).collect()}
        finally:
            textstats._docs = orig
        lens = sorted(r[2] for r in rows)
        assert out[99] == 5009                      # exact corpus max
        for p in textstats.HIST_PCTS:
            exact = lens[-(-len(lens) * p // 100) - 1]
            assert exact <= out[p], (p, exact, out[p])

    def test_events_grouped_sketch_brackets_exact(self, spark):
        """The per-event-type value-quantile sketch (the scale path for
        events_quantiles' exact per-group sort) must bracket the exact
        rank-quantile of every group: order-stat in (est - BIN, est]
        (or est = group max for the overflow bin)."""
        from local_pdftodocx_ocr_spark.operators import relational

        vals = {}
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet") \
                .select("event_type", "value").collect():
            if r["value"] is not None:
                vals.setdefault(r["event_type"], []).append(r["value"])
        for v in vals.values():
            v.sort()
        out = relational.events_value_quantile_sketch(spark, SF_DIR).collect()
        assert {r["event_type"] for r in out} == set(vals)
        for r in out:
            exact = vals[r["event_type"]][r["rank_at"] - 1]
            est = r["est_value_ub"]
            mx = vals[r["event_type"]][-1]
            assert exact <= est, r
            assert est - exact <= relational.EVQ_BIN or est == mx, r

    def test_events_sketch_overflow_and_negative_branches(self, spark, tmp_path):
        """sf values never reach the overflow bin or go negative, so
        those branches are dead in every oracle run — drive them on a
        planted corpus and pin Spark == DuckDB on the same rows: a
        rank that lands on a negative value clamps to bin 0 (est = the
        first bin edge), a rank in the overflow bin reports the exact
        group max."""
        import duckdb

        from local_pdftodocx_ocr_spark.operators import relational

        rows = ([(i, "A", float(v)) for i, v in
                 enumerate((-9, -8, -7, -6, -5, 2000, 3000))]
                + [(10 + j, "B", 50.0) for j in range(4)])
        path = str(tmp_path / "evq")
        spark.createDataFrame(
            rows, "event_id long, event_type string, value double") \
            .write.parquet(f"{path}/events.parquet")
        out = relational.events_value_quantile_sketch(spark, path).collect()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{path}/events.parquet/*.parquet')")
        orows = con.sql(relational.EVQ_SQL).fetchall()
        assert sorted(tuple(r) for r in out) == sorted(orows)
        a = {r["pct"]: r["est_value_ub"] for r in out
             if r["event_type"] == "A"}
        assert a[50] == 8.0        # negative clamps to bin 0 -> first edge
        assert a[99] == 3000.0     # overflow bin -> exact group max

    def test_state_is_bounded(self, spark):
        """The histogram can never exceed HIST_MAX_BIN+1 cells no matter
        the corpus — the property that makes the single-partition
        cumulative window safe at 100 TB."""
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_bins = (d.select(F.least(
            F.expr(f"n_chars DIV {textstats.HIST_BIN_CHARS}"),
            F.lit(textstats.HIST_MAX_BIN).cast("long")).alias("b"))
            .distinct().count())
        assert n_bins <= textstats.HIST_MAX_BIN + 1


class TestHeavyHitters:
    """docs_heavy_hitters: exact heavy hitters behind a count-min
    screen. The oracle mirror pins output equality; these pin the two
    things the oracle can't see — that the screen actually PRUNES
    (survivor vocabulary << corpus vocabulary) and that the exact
    HAVING removes genuine CMS false positives (driven on a
    collision-saturated sketch where every gram survives the screen)."""

    def test_screen_prunes_hard_with_no_false_negatives(self, spark):
        surv_vocab = (textstats._hh_screened(spark, SF_DIR)
                      .select("g").distinct().count())
        vocab = textstats._hh_grams(spark, SF_DIR).distinct().count()
        out = textstats.heavy_hitters(spark, SF_DIR)
        n_out = out.count()
        assert n_out > 0                     # nonempty at the oracle SF
        assert n_out <= surv_vocab           # HAVING only removes
        assert surv_vocab < vocab / 4        # the screen prunes >75%
        # no false negatives: every brute-force hitter is in the output
        grams = textstats._hh_grams(spark, SF_DIR)
        total = grams.count()
        brute = (grams.groupBy("g").agg(F.count("*").alias("n"))
                 .filter(F.col("n") * 10000 >= textstats.HH_THETA_BP * total))
        assert brute.count() == n_out

    def test_fp_removal_on_collision_saturated_sketch(self, spark, tmp_path,
                                                      monkeypatch):
        """Width 2 forces every gram into the same two buckets per row,
        so the screen passes EVERYTHING (worst-case false positives);
        the output must still be exactly the brute-force answer."""
        import duckdb

        hot = " ".join(["hot spot"] * 60)            # 'hot spot' x60
        light = [f"w{i} w{i + 1} w{i + 2}" for i in range(0, 3000, 3)]
        rows = [(0, hot)] + [(i + 1, t) for i, t in enumerate(light)]
        path = str(tmp_path / "hh")
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.parquet(f"{path}/documents.parquet")
        monkeypatch.setattr(textstats, "CMS_W", 2)
        surv_vocab = (textstats._hh_screened(spark, path)
                      .select("g").distinct().count())
        out = {(r["gram"], r["n"])
               for r in textstats.heavy_hitters(spark, path).collect()}
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}/documents.parquet/*.parquet')")
        oracle = set(map(tuple, con.sql(textstats.HEAVY_HITTERS_SQL).fetchall()))
        assert out == oracle and len(out) > 0
        # the saturated screen really did pass false positives
        assert surv_vocab > len(out)


class TestSourceVocabOverlap:
    """KMV set algebra: the per-source top-k must compile to the
    WindowGroupLimit partial merge (the KMV precedent), and the
    pairwise Jaccard estimate must track the exact vocabulary Jaccard
    within the k=64 sampling band (measured max err 0.081 / mean 0.016
    at sf0.01 — pinned with ~2x headroom)."""

    def test_plan_has_window_group_limit(self, spark):
        df = textstats.source_vocab_overlap(spark, SF_DIR)
        plan = plans.executed_plan(df)
        assert "WindowGroupLimit" in plan, plan
        assert "EvalPython" not in plan, plan

    def test_estimates_track_exact_jaccard(self, spark):
        import itertools
        from collections import defaultdict

        from local_pdftodocx_ocr_spark.operators import dedup
        est = {(r["s1"], r["s2"]): r["jaccard_est"]
               for r in textstats.source_vocab_overlap(spark, SF_DIR)
               .collect()}
        sh = dedup._distinct_shingles(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            key="source").distinct().collect()
        vocab = defaultdict(set)
        for r in sh:
            vocab[r["source"]].add(r["s"])
        errs = []
        for s1, s2 in itertools.combinations(sorted(vocab), 2):
            a, b = vocab[s1], vocab[s2]
            errs.append(abs(est[(s1, s2)] - len(a & b) / len(a | b)))
        assert len(errs) == len(est)
        assert max(errs) < 0.16, max(errs)
        assert sum(errs) / len(errs) < 0.05
