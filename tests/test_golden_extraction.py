"""Golden span-sequence equality: distributed job vs sequential oracle.

The strict analog of the reference's e2e gates (run_e2e_test.py:54-86) per
FIXTURES.md §2: exact (kind, text, media_ref, offset) equality per doc_id,
plus lineage invariants (§3) and partitioning-invariance of the global
checksum.
"""

from __future__ import annotations

import pytest

from local_pdftodocx_ocr_spark import job, kernels, oracle, synth

N_DOCS = 100


@pytest.fixture(scope="module")
def corpus():
    return synth.gen_corpus(N_DOCS)


@pytest.fixture(scope="module")
def extracted(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("golden_out"))
    stats = job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out,
                        num_partitions=7)  # deliberately != shuffle partitions
    return out, stats


def test_span_sequence_equality(spark, corpus, extracted):
    out, _ = extracted
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in job.read_extracted(spark, out).collect()
    }
    expected = {d: s for d, s in oracle.extract_corpus(corpus).items() if s}
    assert set(got) == set(expected)
    for doc_id, exp in expected.items():
        assert got[doc_id] == exp, f"span mismatch for {doc_id}"


def test_lineage_invariants(spark, corpus, extracted):
    out, stats = extracted
    exp = oracle.expected_lineage_totals(corpus)
    assert stats["docs_in"] == exp["docs_in"] == N_DOCS
    assert stats["docs_out"] == exp["docs_out"] <= stats["docs_in"]
    assert stats["checksum"] == exp["checksum"]
    rows = job.read_lineage(spark, out).collect()
    assert sum(r["docs_in"] for r in rows) == N_DOCS
    assert all(r["wall_ms"] >= 0 for r in rows)
    assert len({r["partition_id"] for r in rows}) == len(rows)


def test_checksum_partitioning_invariance(spark, corpus, tmp_path):
    """The N-vs-4N invariant in miniature: different partition counts and
    salts must produce the identical global checksum (FIXTURES.md §3)."""
    docs = job.docs_df_from_corpus(spark, corpus)
    sums = set()
    for n_parts, salt in ((2, 1), (13, 99)):
        unified = job.extract_spans(docs, num_partitions=n_parts, salt=salt)
        lineage = job.split_unified(unified)[1].collect()
        sums.add(kernels.combine_checksums(int(r["checksum"], 16) for r in lineage))
    assert len(sums) == 1
    assert sums.pop() == oracle.expected_lineage_totals(corpus)["checksum"]


def test_skewed_corpus_equality(spark, tmp_path):
    """Salted repartition path with a 50x fat-doc tail still matches the
    oracle exactly."""
    corpus = synth.gen_corpus(100, skew=True)
    out = str(tmp_path / "skew_out")
    stats = job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out,
                        num_partitions=8)
    exp = oracle.expected_lineage_totals(corpus)
    assert stats["checksum"] == exp["checksum"]
    assert stats["docs_out"] == exp["docs_out"]


def test_chunked_path_equality(spark, tmp_path):
    """Oversized-doc chunking (route-per-chunk + doc-level finalize)
    must produce byte-identical spans and the same global checksum as
    the single-pass path and the oracle."""
    corpus = synth.gen_corpus(100, skew=True)
    docs = job.docs_df_from_corpus(spark, corpus)
    unified = job.extract_spans_auto(docs, num_partitions=6, chunk_threshold=40)
    spans_df, lineage = job.split_unified(unified)
    got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]]
           for r in spans_df.collect()}
    expected = {d: s for d, s in oracle.extract_corpus(corpus).items() if s}
    assert got == expected
    rows = lineage.collect()
    chk = kernels.combine_checksums(int(r["checksum"], 16) for r in rows)
    exp = oracle.expected_lineage_totals(corpus)
    assert chk == exp["checksum"]
    assert sum(r["docs_in"] for r in rows) == exp["docs_in"]


def test_run_job_with_chunking_resumes(spark, tmp_path):
    corpus = synth.gen_corpus(60, skew=True)
    out = str(tmp_path / "chunk_resume")
    stats = job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out,
                        num_partitions=4, chunk_threshold=40)
    exp = oracle.expected_lineage_totals(corpus)
    assert stats["checksum"] == exp["checksum"]
    stats2 = job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out,
                         num_partitions=4, chunk_threshold=40)
    assert stats2["docs_in"] == 0


def test_partition_balance_no_stragglers(spark):
    """The salted repartition must spread documents uniformly: with 500
    docs over 8 partitions, per-partition docs_in stays within 2x of the
    mean (the no-straggler property BENCH.md relies on)."""
    corpus = synth.gen_corpus(500)
    unified = job.extract_spans(job.docs_df_from_corpus(spark, corpus),
                                num_partitions=8)
    rows = job.split_unified(unified)[1].collect()
    counts = [r["docs_in"] for r in rows]
    assert len(counts) == 8
    mean = sum(counts) / len(counts)
    assert max(counts) <= 2 * mean, counts
    assert min(counts) >= 0.5 * mean, counts


def test_anti_leak_general_docs(spark):
    """FIXTURES.md §4 anti-leak analog (reference _check_general_pdf):
    general docs must carry their own sentinels verbatim and must NOT
    contain demo-doc phrases (no cross-document contamination)."""
    cycle = len(synth._DOC_BUILDERS)
    corpus = synth.gen_corpus(3 * cycle)
    ex = oracle.extract_corpus(corpus)
    demo_only = {"Confidential", "internal draft"}
    for i in range(1, 3 * cycle, cycle):  # general-like docs
        texts = " ".join(t for (_, t, _, _) in ex[f"doc-{i:06d}"])
        assert "UNIQUE_TOKEN_ALPHA_7788" in texts
        assert not any(p in texts for p in demo_only)


def test_empty_input_job(spark, tmp_path):
    from local_pdftodocx_ocr_spark.sources.tables import empty_docs
    out = str(tmp_path / "empty")
    stats = job.run_job(spark, empty_docs(spark), out, num_partitions=2)
    assert stats["docs_in"] == 0 and stats["docs_out"] == 0
    # and the committed (empty) snapshot still supports resume
    stats2 = job.run_job(spark, job.docs_df_from_corpus(spark, synth.gen_corpus(5)),
                         out, num_partitions=2)
    assert stats2["docs_in"] == 5


class TestExternalDetections:
    """M1/M2 seam closure: an external layout-detections side table
    (class/conf/bbox/crop-ref) merges through the unchanged J1/P9/M4
    kernels — every override-vs-merge branch asserted explicitly."""

    @pytest.fixture(scope="class")
    def det_extracted(self, spark):
        corpus, dets = synth.gen_detections_corpus()
        docs = job.docs_df_from_corpus(spark, corpus)
        dets_df = spark.createDataFrame(
            dets, "doc_id string, page int, x double, y double, w double, "
                  "h double, cls string, conf double, media_ref string")
        injected = job.inject_external_detections(docs, dets_df)
        unified = job.extract_spans(injected, num_partitions=3)
        rows = job.split_unified(unified)[0].collect()
        return corpus, dets, {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]] for r in rows}

    def test_equals_sequential_injection(self, det_extracted):
        corpus, dets, got = det_extracted
        for doc_id, spans in synth.apply_detections_seq(corpus, dets):
            expected = kernels.extract_document(doc_id, spans)
            assert got.get(doc_id, []) == expected, doc_id

    def test_override_suppresses_covered_text(self, det_extracted):
        _, _, got = det_extracted
        texts = [t for _, t, _, _ in got["det-000"]]
        assert not any("stray caption" in t for t in texts)
        # the duty-marker heading inside the same rect is exempt (J1)
        assert any(t.startswith("7)") for t in texts)
        # the no-detections doc keeps its stray caption (merge baseline)
        assert any("stray caption" in t
                   for _, t, _, _ in got["det-002"])

    def test_merge_appends_structure(self, det_extracted):
        _, _, got = det_extracted
        kinds_ref = [(k, m) for k, _, m, _ in got["det-001"]]
        # the high-conf figure detection landed as a figure block
        assert any(k == "figure" and "cXJnLWN1YmdiLTE" in m
                   for k, m in kinds_ref)
        # the table detection landed with crop-derived content (W5)
        assert any(k == "table" and "part" in t
                   for k, t, _, _ in got["det-001"])

    def test_confidence_and_validity_gates(self, det_extracted):
        _, dets, got = det_extracted
        low_conf_ref = kernels.encode_media("low-conf")
        for spans in got.values():
            refs = [m for _, _, m, _ in spans]
            assert low_conf_ref not in refs          # conf 0.31 gated
        # P9: the 10x8 figure bbox (the only ref-less detection) never
        # produces a block — any survivor would be a figure with an
        # empty media_ref in the detection offset namespace
        for spans in got.values():
            assert not any(kind == "figure" and m == "" and off >= 2_000_000
                           for kind, _, m, off in spans)

    def test_m4_reclassify_from_crop(self, det_extracted):
        _, _, got = det_extracted
        # det-000 (k even) carries the grid-crop figure -> table block
        assert any(k == "table" and t.startswith("qty\tprice")
                   for k, t, _, _ in got["det-000"]), got["det-000"]

    def test_detection_for_unknown_doc_is_ignored(self, det_extracted):
        _, _, got = det_extracted
        assert "det-missing-999" not in got

    def test_shared_anchor_offsets_deterministic(self, spark):
        """Two detections sharing a bbox origin (same page/y/x, different
        class — routine in real detector output) must get deterministic
        offsets: the window order is the TOTAL key
        (page, y, x, w, h, cls, media_ref), matching
        apply_detections_seq's tuple sort. Before the total-order fix,
        row_number over (page, y, x) alone made span order run-dependent."""
        corpus = synth.gen_corpus(4)
        docs = job.docs_df_from_corpus(spark, corpus)
        ref_a = kernels.encode_media("anchor-fig")
        # same (page, y, x); differ in w/h/cls/media_ref; plus an exact
        # tie through (page,y,x,w,h) broken only by cls then media_ref
        dets = [("doc-000001", 0, 40.0, 300.0, 200.0, 120.0, "figure", 0.9, ref_a),
                ("doc-000001", 0, 40.0, 300.0, 300.0, 150.0, "table", 0.9,
                 kernels.encode_media("part\tqty\nbolt\t4")),
                ("doc-000001", 0, 40.0, 300.0, 200.0, 120.0, "table", 0.9,
                 kernels.encode_media("a\tb\nc\td"))]
        dets_df = spark.createDataFrame(
            dets, "doc_id string, page int, x double, y double, w double, "
                  "h double, cls string, conf double, media_ref string")
        injected = job.inject_external_detections(docs, dets_df)
        # collect_list order is not contractual — offset assignment is.
        got = {r["doc_id"]: sorted(
                   (s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in r["spans"] if s["offset"] >= 2_000_000)
               for r in injected.collect()}
        seq_full = dict(synth.apply_detections_seq(corpus, dets))
        seq = {doc_id: sorted((s["kind"], s["text"], s["media_ref"], s["offset"])
                              for s in spans if s["offset"] >= 2_000_000)
               for doc_id, spans in seq_full.items()}
        assert got["doc-000001"] == seq["doc-000001"]
        # and the full extraction downstream agrees span-for-span
        unified = job.extract_spans(injected, num_partitions=2)
        ex = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r["spans"]]
              for r in job.split_unified(unified)[0].collect()}
        for doc_id, spans in seq_full.items():
            assert ex.get(doc_id, []) == kernels.extract_document(
                doc_id, spans), doc_id
