"""Unit tests for the pure operator kernels (SURVEY.md §5: mirror of the
reference's operator-level golden tests, tests/test_docling_adapter.py style)."""

from __future__ import annotations

from local_pdftodocx_ocr_spark import kernels, synth
from local_pdftodocx_ocr_spark.kernels import (
    Block,
    clean_text,
    extract_document,
    flatten_table,
    is_reliable_text,
    is_valid_section_marker,
    parse_pos_header,
    recognize_one,
    sort_reading_order,
    strip_boilerplate_html,
    text_norm_key,
)


class TestCleanText:
    def test_control_and_zero_width_strip(self):
        assert clean_text("a\x00b​c") == "abc"

    def test_thai_digits(self):
        assert clean_text("๑๒๓") == "123"

    def test_thai_spacing_collapse(self):
        assert clean_text("ภาษา ไทย") == "ภาษาไทย"
        # latin words keep their spaces
        assert clean_text("hello world") == "hello world"

    def test_sara_ae_recompose(self):
        assert clean_text("เเมว") == "แมว"

    def test_sara_am_recompose(self):
        assert clean_text("นํา") == "นำ"

    def test_duplicate_combining_marks(self):
        assert clean_text("กั้ั้น") != ""  # no crash; marks collapsed
        assert clean_text("ก้้") == "ก้"

    def test_junk_lines_dropped(self):
        assert clean_text("real text\n~~~~\n|||\nmore") == "real text\nmore"

    def test_whitespace_collapse(self):
        assert clean_text("a   b\n\n\n\nc") == "a b\n\nc"

    def test_idempotent(self):
        s = "2.1 ภาษา ไทย ๑ with   spaces\n\n\nx"
        assert clean_text(clean_text(s)) == clean_text(s)


class TestReliability:
    def test_reliable_prose(self):
        assert is_reliable_text("normal english prose here")

    def test_symbol_soup_unreliable(self):
        assert not is_reliable_text("??? ### %% ~~ ^^ || ::: ;;; !!!")

    def test_replacement_chars_unreliable(self):
        assert not is_reliable_text("he�llo wor�ld ab�")


class TestRecognize:
    def test_roundtrip(self):
        ref = kernels.encode_media("hello ภาษาไทย 123")
        assert recognize_one(ref) == "hello ภาษาไทย 123"

    def test_bad_ref(self):
        assert recognize_one("") == ""
        assert recognize_one("s3://bucket/key") == ""
        assert recognize_one("mem:!!!notbase64!!!") == ""

    def test_batch_matches_single(self):
        refs = [kernels.encode_media(t) for t in ("a", "b", "c")]
        assert kernels.recognize_batch(refs) == ["a", "b", "c"]


class TestBoilerplate:
    def test_nav_footer_stripped(self):
        html = ("<nav><a href='/'>home</a></nav>"
                "<p>this is the long main content paragraph of the page</p>"
                "<footer>copyright</footer>")
        assert strip_boilerplate_html(html) == \
            "this is the long main content paragraph of the page"

    def test_link_farm_dropped(self):
        html = ("<p>this is the long main content paragraph of the page</p>"
                "<p><a href='a'>aaaaaaaaaaaa</a> <a href='b'>bbbbbbbbbbbb</a></p>")
        out = strip_boilerplate_html(html)
        assert "main content" in out and "aaaa" not in out

    def test_short_block_smoothing(self):
        html = ("<p>first long paragraph with plenty of real content here</p>"
                "<p>short bridge</p>"
                "<p>second long paragraph with plenty of real content too</p>")
        out = strip_boilerplate_html(html).split("\n")
        assert len(out) == 3 and out[1] == "short bridge"

    def test_short_block_not_kept_at_edge(self):
        html = ("<p>tiny</p>"
                "<p>one long paragraph with plenty of real textual content</p>")
        assert strip_boilerplate_html(html) == \
            "one long paragraph with plenty of real textual content"


class TestTableFlatten:
    def test_empty_col_dropped(self):
        assert flatten_table("a\t\tb\n1\t\t2") == "a\tb\n1\t2"

    def test_duplicate_col_collapsed(self):
        assert flatten_table("a\ta\tb\nc\tc\td") == "a\tb\nc\td"

    def test_ragged_rows_padded_then_trimmed(self):
        assert flatten_table("a\tb\tc\n1") == "a\tb\tc\n1"

    def test_empty_rows_dropped(self):
        assert flatten_table("a\tb\n\t\n1\t2") == "a\tb\n1\t2"


class TestGeometry:
    def test_pos_header(self):
        assert parse_pos_header("p=2;y=10.5;x=3.0|body") == (2, 10.5, 3.0, 0.0, 0.0, "body")

    def test_pos_header_with_bbox(self):
        assert parse_pos_header("p=2;y=10.5;x=3.0;w=100;h=40|b") == \
            (2, 10.5, 3.0, 100.0, 40.0, "b")

    def test_headerless(self):
        assert parse_pos_header("plain") == (0, -1.0, -1.0, 0.0, 0.0, "plain")

    def test_reading_order_two_columns(self):
        blocks = [
            Block("text", 0, 100, 800, "R0"), Block("text", 0, 100, 50, "L0"),
            Block("text", 0, 300, 800, "R1"), Block("text", 0, 300, 50, "L1"),
        ]
        out = [b.text for b in sort_reading_order(blocks)]
        assert out == ["L0", "L1", "R0", "R1"]

    def test_reading_order_single_column_yx(self):
        blocks = [Block("text", 0, 200, 50, "B"), Block("text", 0, 100, 300, "A")]
        assert [b.text for b in sort_reading_order(blocks)] == ["A", "B"]

    def test_pages_ordered(self):
        blocks = [Block("text", 1, 10, 10, "P1"), Block("text", 0, 900, 10, "P0")]
        assert [b.text for b in sort_reading_order(blocks)] == ["P0", "P1"]


class TestMarkers:
    def test_valid(self):
        assert is_valid_section_marker("3)")
        assert is_valid_section_marker("2.4")
        assert is_valid_section_marker("7.")

    def test_invalid(self):
        assert not is_valid_section_marker("31)")
        assert not is_valid_section_marker("21.1")
        assert not is_valid_section_marker("3.5.1")


class TestExtractDocument:
    def _doc(self, i=0):
        return synth.gen_doc(i)

    def test_offsets_dense(self):
        _, spans = self._doc(0)
        out = extract_document("d", spans)
        assert [o for (_, _, _, o) in out] == list(range(len(out)))

    def test_footers_stripped(self):
        _, spans = self._doc(0)  # demo doc has boiler footers on each page
        out = extract_document("d", spans)
        assert not any("Page" in t and "of 3" in t for (_, t, _, _) in out)
        assert not any("Confidential" in t for (_, t, _, _) in out)

    def test_stub_merged(self):
        _, spans = self._doc(0)
        out = extract_document("d", spans)
        stubs = [t for (_, t, _, _) in out if t.strip() == "3."]
        merged = [t for (_, t, _, _) in out if t.startswith("3. ")]
        assert not stubs and len(merged) == 1

    def test_sentinels_survive(self):
        _, spans = self._doc(1)  # general doc
        texts = " ".join(t for (_, t, _, _) in extract_document("d", spans))
        assert "UNIQUE_TOKEN_ALPHA_7788" in texts
        assert "UNIQUE_TOKEN_BETA_9911" in texts

    def test_unreliable_with_media_recognized(self):
        _, spans = self._doc(5)
        out = extract_document("d", spans)
        # garbled span with media backup recovered; bare garbled span dropped
        assert len([1 for (k, t, _, _) in out if k == "text"]) == 2

    def test_empty_doc(self):
        assert extract_document("d", []) == []

    def test_media_text_cache_equivalence(self):
        _, spans = self._doc(3)  # image doc
        refs = {s["media_ref"] for s in spans if s["media_ref"]}
        cache = dict(zip(sorted(refs), kernels.recognize_batch(sorted(refs))))
        assert extract_document("d", spans, cache) == extract_document("d", spans)

    def test_near_duplicates_removed(self):
        _, spans = self._doc(8)
        out = extract_document("d", spans)
        # 4 source spans -> base kept once, containment dup + norm-key dup gone
        assert len(out) == 2

    def test_figure_placeholder_numbering_and_prune(self):
        # image doc has 3 figures on page 0; T1 keeps the 2 largest
        _, spans = self._doc(3)
        out = extract_document("d", spans)
        figs = [(t, m) for (k, t, m, _) in out if k == "figure"]
        assert [t for t, _ in figs] == ["[Figure 1 — Page 1]", "[Figure 2 — Page 1]"]
        assert not any(m == kernels.encode_media("thumb-small") for _, m in figs)

    def test_structure_suppression(self):
        # demo doc page 1: stray text inside the table rect is dropped,
        # the marker heading overlapping it is kept (J1 exemption)
        _, spans = self._doc(0)
        texts = [t for (_, t, _, _) in extract_document("d", spans)]
        assert not any("stray cell text" in t for t in texts)
        assert any(t.startswith("6)") for t in texts)

    def test_wrapped_lines_merge(self):
        # edge doc i=37: first three lines merge, big gap starts a new para
        _, spans = synth.gen_doc(37)
        out = extract_document("d", spans)
        assert len(out) == 2
        assert all(k == "text" for (k, _, _, _) in out)

    def test_thai_join(self):
        assert kernels.join_text_blocks("ไทย", "ต่อ") == "ไทยต่อ"
        assert kernels.join_text_blocks("abc", "def") == "abc def"


class TestCellPredicates:
    def test_plausible_cells(self):
        assert kernels.plausible_table_cell("12,500")
        assert kernels.plausible_table_cell("ภาษาไทย")
        assert kernels.plausible_table_cell("Printer model")
        assert kernels.plausible_table_cell("pc-01")
        assert not kernels.plausible_table_cell("")
        assert not kernels.plausible_table_cell("----")
        assert not kernels.plausible_table_cell("กากากา")
        assert not kernels.plausible_table_cell("XKQJWPTRZ BNMKL")  # caps soup

    def test_reference_parity_cases(self):
        # ported from the reference's tests/test_docling_adapter.py
        # (test_plausible_keeps_latin_product_names, test_garbled_latin_detected,
        # test_section_marker_rejects_chart_decimals)
        assert kernels.looks_like_healthy_latin("Microsoft Windows")
        assert kernels.looks_like_healthy_latin("ESET")
        assert kernels.plausible_table_cell("Microsoft Windows")
        assert kernels.plausible_table_cell("Next Generation Firewall")
        assert kernels.looks_garbled_for_thai(
            "COMMSSUBLMACLUNGMUNEUSLUOBLUMLABEMUI ENUCSH")
        assert not kernels.looks_garbled_for_thai("Hello English only")
        assert not kernels.looks_garbled_for_thai("Microsoft Windows Server")
        assert not kernels.looks_garbled_for_thai(
            "วิเคราะห์และตรวจสอบมาตรฐานการผลิต")
        from local_pdftodocx_ocr_spark.kernels import is_valid_section_marker
        assert is_valid_section_marker("2.1")
        assert is_valid_section_marker("11)")
        assert not is_valid_section_marker("0.78")
        assert not is_valid_section_marker("0.5")
        assert not is_valid_section_marker("99.99")

    def test_garbled_for_thai(self):
        assert kernels.looks_garbled_for_thai("XKQJWPTRZ BNMKL")  # no vowels
        assert not kernels.looks_garbled_for_thai("WARNING DO NOT ENTER")
        assert not kernels.looks_garbled_for_thai("ภาษาไทยจริง")
        assert not kernels.looks_garbled_for_thai("normal english text")
        assert not kernels.looks_garbled_for_thai("")


class TestGridTable:
    def _text(self, body, fill=""):
        g = kernels.parse_grid_table(body)
        assert g is not None
        return kernels.grid_table_text(*g, fill_payload=fill)

    def test_not_a_grid(self):
        assert kernels.parse_grid_table("a\tb\nc\td") is None

    def test_spanned_flatten(self):
        body = "grid:2,3\n0,0,1,3|Head\n1,0|ab\n1,1|qty\n1,2|3"
        assert self._text(body) == "Head\nab\tqty\t3"

    def test_single_letter_cell_rejected(self):
        # P6 faithful: a lone Latin letter is blank-crop residue
        assert self._text("grid:1,2\n0,0|a\n0,1|42") == "\t42"

    def test_rowspan_and_uncovered_slot(self):
        body = "grid:2,2\n0,0,2,1|label\n0,1|5"
        # (1,1) uncovered -> empty cell; trailing empties trimmed
        assert self._text(body) == "label\t5"

    def test_garble_cell_dropped_digit_seed_kept(self):
        body = "grid:1,2\n0,0|XKQJWPTRZ BNMKL\n0,1|42"
        assert self._text(body) == "\t42"

    def test_fill_accepted_only_when_substantial(self):
        body = "grid:1,3\n0,0|Item"
        fill = kernels.encode_media("0,1|7\n0,2|~~~~")
        out = self._text(body, kernels.recognize_one(fill))
        assert out == "Item\t7"

    def test_fill_never_overwrites_covered(self):
        body = "grid:1,2\n0,0|Item\n0,1|9"
        out = self._text(body, "0,1|777")
        assert out == "Item\t9"

    def test_duplicate_leading_cols_collapse(self):
        body = "grid:2,3\n0,0|item\n0,1|item\n0,2|qty\n1,0|disk\n1,1|disk\n1,2|4"
        assert self._text(body) == "item\tqty\ndisk\t4"

    def test_no_collapse_when_cols_differ(self):
        body = "grid:1,3\n0,0|aa\n0,1|bb\n0,2|cc"
        assert self._text(body) == "aa\tbb\tcc"

    def test_size_guard(self):
        assert kernels.grid_table_text(101, 2, [[0, 0, 1, 1, "x"]]) == ""

    def test_span_clamped(self):
        body = "grid:2,2\n0,0,9,9|xy"         # clamps to the grid
        assert self._text(body) == "xy"


class TestGridlessTable:
    def test_rows_clustered_and_padded(self):
        segs = [
            (300.0, 100.0, 120.0, "qty"),
            (40.0, 102.0, 118.0, "name"),
            (40.0, 200.0, 220.0, "bolt"),
            (300.0, 198.0, 222.0, "12"),
            (40.0, 260.0, 280.0, "nut"),
        ]
        assert kernels.items_to_table(segs) == "name\tqty\nbolt\t12\nnut\t"

    def test_empty(self):
        assert kernels.items_to_table([]) == ""


class TestSegmentsToLines:
    def test_clustering_and_thai_join(self):
        segs = [
            (400.0, 102.0, 118.0, "ไท"),
            (300.0, 100.0, 120.0, "ภาษา"),
            (40.0, 104.0, 117.0, "heading"),
            (40.0, 160.0, 180.0, "below"),
        ]
        assert kernels.segments_to_lines(segs) == ["heading ภาษาไท", "below"]

    def test_tolerance_is_height_relative(self):
        # 0.6 x height tolerance: centers 10 apart, heights 20 -> same line
        same = kernels.segments_to_lines([(0, 0, 20, "a"), (10, 10, 30, "b")])
        assert same == ["a b"]
        # centers 40 apart, heights 20 -> separate lines
        sep = kernels.segments_to_lines([(0, 0, 20, "a"), (10, 40, 60, "b")])
        assert sep == ["a", "b"]

    def test_payload_roundtrip(self):
        ref = kernels.encode_media_segments([(1.0, 2.0, 3.0, "x|y"), (4.0, 5.0, 6.0, "ไทย")])
        segs = kernels.parse_segments_payload(kernels.recognize_one(ref))
        assert [s[3] for s in segs] == ["x|y", "ไทย"]

    def test_plain_payload_is_not_segments(self):
        assert kernels.parse_segments_payload("plain text") is None


class TestPageSegmentation:
    def test_blocks_split_on_big_gaps(self):
        segs = [
            (40.0, 80.0, 100.0, "heading"),
            (40.0, 180.0, 200.0, "para one"),
            (40.0, 205.0, 225.0, "para two"),
            (40.0, 500.0, 520.0, "closing"),
        ]
        blocks = kernels.segment_page_blocks(segs)
        assert [t for (_, _, t) in blocks] == [
            "heading", "para one\npara two", "closing"]
        # block geometry comes from its first line
        assert blocks[0][0] == 80.0 and blocks[1][0] == 180.0

    def test_page_image_span_routes_to_multiple_blocks(self):
        _, spans = synth.gen_doc(14)  # page-image doc
        out = extract_document("d", spans)
        texts = [t for (k, t, _, _) in out if k == "text"]
        assert any(t.startswith("Document heading") for t in texts)
        assert any("\n" in t and "paragraph" in t for t in texts)
        assert len(texts) >= 3

    def test_plain_payload_is_one_block(self):
        spans = [synth._span("page_image", 0, 100, 40, "",
                             kernels.encode_media("whole page text body"), 0)]
        out = extract_document("d", spans)
        assert [t for (_, t, _, _) in out] == ["whole page text body"]

    def test_two_column_page_image_gets_xy_cut_order(self):
        """Round-3 adversarial fixture: the two-column full-page payload
        must come out left-column-first (XY-cut), NOT in global y-order —
        'Lcol second block' (y=400) precedes 'Rcol first block' (y=250)."""
        _, spans = synth.gen_doc(14)
        out = extract_document("d", spans)
        page2 = [t for (k, t, _, _) in out if k == "text" and "col " in t]
        assert page2 == [
            "Lcol intro alpha\nLcol intro beta",
            "Lcol second block",
            "Rcol first block",
            "Rcol closing block",
        ], page2


class TestFigureReclassifyM4:
    def test_grid_content_becomes_table(self):
        _, spans = synth.gen_doc(14)
        out = extract_document("d", spans)
        tables = [t for (k, t, _, _) in out if k == "table"]
        figures = [m for (k, _, m, _) in out if k == "figure"]
        assert tables == ["qty\tprice\n4\t99"]   # M4 reclassified
        assert len(figures) == 1                  # the single-column one stays

    def test_plain_media_figure_unchanged(self):
        spans = [synth._span("figure", 0, 100, 40, "",
                             kernels.encode_media("photo"), 0)]
        out = extract_document("d", spans)
        assert [k for (k, _, _, _) in out] == ["figure"]


class TestBandRecovery:
    def _run(self, spans):
        return [t for (_, t, _, _) in extract_document("d", spans)]

    def test_missing_marker_recovered_present_dropped(self):
        _, spans = synth.gen_doc(12)  # band doc
        texts = self._run(spans)
        fives = [t for t in texts if t.startswith("5)")]
        fours = [t for t in texts if t.startswith("4)")]
        assert len(fives) == 1          # missing 5) recovered from the band
        assert len(fours) == 1          # present 4) NOT duplicated (additive)
        assert not any(t.startswith("9)") for t in texts)  # substance gate

    def test_band_without_marker_dropped(self):
        spans = [synth._span("band", 0, 100, 40, "",
                             kernels.encode_media("no marker here at all"), 0)]
        assert extract_document("d", spans) == []


class TestWeakPrimaryReplacement:
    def test_rich_secondary_replaces_weak_primary(self):
        _, spans = synth.gen_doc(13)  # weak-primary doc
        out = extract_document("d", spans)
        texts = [t for (_, t, _, _) in out]
        assert not any(t == "brief note" for t in texts)
        assert len(out) == 2            # secondary absorbed, not duplicated

    def test_equal_blocks_not_replaced(self):
        spans = [
            synth._span("text", 0, 100, 40, "alpha beta gamma delta", "", 0, w=600, h=40),
            synth._span("image", 0, 110, 60, "",
                        kernels.encode_media("alpha beta gamma delta"), 1, w=300, h=20),
        ]
        out = extract_document("d", spans)
        assert len(out) == 1            # exact dup -> dedup keeps one


class TestAreaFilterT4:
    def test_sliver_dropped_even_under_topk(self):
        spans = [
            synth._span("figure", 0, 100, 40, "", kernels.encode_media("big"), 0, w=400, h=200),
            # passes the P9 absolute minimums (sides>=40, area>=2000)
            # but sits under 8% of the page max figure area
            synth._span("figure", 0, 400, 40, "", kernels.encode_media("tiny"), 1, w=50, h=60),
        ]
        out = extract_document("d", spans)
        figs = [m for (k, _, m, _) in out if k == "figure"]
        # 3000 < 0.08 * 80000 = 6400: the sliver dies despite max_figs=2
        assert figs == [kernels.encode_media("big")]

    def test_above_threshold_kept(self):
        spans = [
            synth._span("figure", 0, 100, 40, "", kernels.encode_media("big"), 0, w=400, h=200),
            synth._span("figure", 0, 400, 40, "", kernels.encode_media("ok"), 1, w=100, h=80),
        ]
        out = extract_document("d", spans)
        assert len([1 for (k, _, _, _) in out if k == "figure"]) == 2


class TestFigureValidityP9:
    def test_below_min_side_or_area_dropped(self):
        spans = [
            synth._span("figure", 0, 100, 40, "", kernels.encode_media("thin"), 0, w=300, h=10),
            synth._span("figure", 0, 200, 40, "", kernels.encode_media("small"), 1, w=41, h=41),
            synth._span("figure", 0, 300, 40, "", kernels.encode_media("fine"), 2, w=100, h=100),
        ]
        out = extract_document("d", spans)
        figs = [m for (k, _, m, _) in out if k == "figure"]
        # h=10 < 40 dies; 41x41=1681 < 2000 dies; 100x100 survives
        assert figs == [kernels.encode_media("fine")]

    def test_point_positioned_bypasses(self):
        spans = [synth._span("figure", 0, 100, 40, "",
                             kernels.encode_media("nobbox"), 0)]
        out = extract_document("d", spans)
        assert len(out) == 1


class TestWeakTextRescueP4:
    def test_weak_text_with_backup_rerecognized(self):
        rich = "recovered full sentence from the media backup layer"
        spans = [synth._span("text", 0, 100, 40, "2.1",
                             kernels.encode_media(rich), 0)]
        out = extract_document("d", spans)
        assert [t for (_, t, _, _) in out] == [rich]

    def test_weak_text_without_backup_kept(self):
        # weak but reliable, no media: the text layer stands
        spans = [synth._span("text", 0, 100, 40, "tiny", "", 0)]
        out = extract_document("d", spans)
        assert [t for (_, t, _, _) in out] == ["tiny"]

    def test_strong_text_not_rerecognized(self):
        strong = "a perfectly healthy embedded text layer sentence"
        spans = [synth._span("text", 0, 100, 40, strong,
                             kernels.encode_media("should not be used"), 0)]
        out = extract_document("d", spans)
        assert [t for (_, t, _, _) in out] == [strong]


class TestChecksums:
    def test_order_insensitive(self):
        a = kernels.doc_checksum("a", [("text", "x", "", 0)])
        b = kernels.doc_checksum("b", [("text", "y", "", 0)])
        assert kernels.combine_checksums([a, b]) == kernels.combine_checksums([b, a])

    def test_sensitive_to_content(self):
        a = kernels.doc_checksum("a", [("text", "x", "", 0)])
        b = kernels.doc_checksum("a", [("text", "x!", "", 0)])
        assert a != b


class TestSynthDeterminism:
    def test_stable_across_corpus_sizes(self):
        small = dict(synth.gen_corpus(10))
        big = dict(synth.gen_corpus(50))
        for k, v in small.items():
            assert big[k] == v

    def test_skew_tail(self):
        docs = synth.gen_corpus(100, skew=True)
        sizes = [len(s) for _, s in docs]
        assert max(sizes) > 50 * (sum(sizes) - max(sizes)) / max(1, len(sizes) - 1) / 3


class TestMashedSplit:
    def test_mashed_markers_split(self):
        _, spans = synth.gen_doc(0)
        out = extract_document("d", spans)
        texts = [t for (_, t, _, _) in out]
        tens = [t for t in texts if t.startswith("10) ")]
        elevens = [t for t in texts if t.startswith("11) ")]
        assert len(tens) == 1 and len(elevens) == 1
        assert "11)" not in tens[0]

    def test_decimals_not_split(self):
        # "2 items)" is not a valid marker context; "out of 40) chart" is
        # invalid (>30) — neither splits
        from local_pdftodocx_ocr_spark.kernels import _split_mashed_markers, Block
        b = Block("text", 0, 10, 10, "keep 99) together and 40) too")
        assert [x.text for x in _split_mashed_markers([b])] == \
            ["keep 99) together and 40) too"]


class TestEngineRouting:
    def test_thai_payload_routes_to_memt(self):
        ref = kernels.encode_media("ภาษาไทย ๑๒๓")
        assert ref.startswith("memt:")
        assert kernels.recognize_one(ref) == "ภาษาไทย ๑๒๓"

    def test_latin_payload_routes_to_mem(self):
        ref = kernels.encode_media("plain english")
        assert ref.startswith("mem:") and not ref.startswith("memt:")
        assert kernels.recognize_one(ref) == "plain english"

    def test_no_fallback_between_engines(self):
        # a memt: ref with a mem:-style payload must NOT fall back
        import base64, codecs
        rot = base64.b64encode(codecs.encode("abc", "rot13").encode()).decode()
        out = kernels.recognize_one("memt:" + rot)
        assert out != "abc"  # decoded by the memt engine only


class TestReferenceE2EGates:
    """Mirror of the reference's own e2e gates (run_e2e_test.py:83-89,
    337-355) on the demo-like fixture: structure counts, needle
    presence, and the body block-order skeleton."""

    def test_demo_doc_gates(self):
        _, spans = synth.gen_doc(0)
        out = extract_document("d", spans)
        kinds = [k for (k, _, _, _) in out]
        # 2 tables + 2 figures (reference gate: exactly 2 and 2)
        assert kinds.count("table") == 2
        assert kinds.count("figure") == 2
        texts = [t for (_, t, _, _) in out]
        # needles: section markers and duty-list markers survive in order
        for needle in ("2.1", "2.2", "2.3", "3)", "4)", "5)", "10)", "11)"):
            assert any(t.startswith(needle) for t in texts), needle
        # block-order skeleton on page 1 (reference's P/T/I check):
        # duty list items ... then table then figure
        i_5 = next(i for i, t in enumerate(texts) if t.startswith("5)"))
        i_tab = next(i for i, (k, t, _, _) in enumerate(out)
                     if k == "table" and "h1" in t)
        i_fig = next(i for i, (k, t, _, _) in enumerate(out)
                     if k == "figure" and "Page 2" in t)
        assert i_5 < i_tab < i_fig
        # no junk tokens (reference junk gate)
        assert not any(t.strip() in ("|", "~~~~") for t in texts)
