"""Deterministic synthetic interleaved-document corpora (FIXTURES.md).

Two generators, both fully deterministic (seeded Mersenne Twister /
pure arithmetic on doc ids — no wall clock, no global hash seed):

* :func:`gen_corpus` — the pytest/golden corpus: demo-like docs
  (markers, tables, figures, boiler footers, near-dups), general-like
  docs (sentinel tokens), html docs, Thai docs, two-column docs, edge
  docs (empty / media-only / unreliable), optional skew tail.
* :func:`spans_from_flat_doc` — derives an interleaved span document
  from one row of the driver's ``documents.parquet`` (doc_id, text), so
  ``entry()`` and the benchmark scale with the provided sf dirs without
  any external data.
"""

from __future__ import annotations

import random

from . import kernels

_WORDS = (
    "the quick brown fox jumps over a lazy dog while spark executors "
    "shuffle partitions across the cluster reading parquet row groups "
    "with predicate pushdown and column pruning enabled for every scan"
).split()

_THAI_BODY = "ตัวอย่างข้อความภาษาไทยสำหรับการทดสอบการสกัดเนื้อหา"


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _span(kind: str, page: int, y: float, x: float, body: str,
          media_ref: str, offset: int, w: float = 0.0, h: float = 0.0) -> dict:
    hdr = f"p={page};y={y:.1f};x={x:.1f}"
    if w or h:
        hdr += f";w={w:.1f};h={h:.1f}"
    return {
        "kind": kind,
        "text": hdr + "|" + body,
        "media_ref": media_ref,
        "offset": offset,
    }


def _demo_doc(rng: random.Random) -> list[dict]:
    """Analog of tests/fixtures/testocrtor-demo.pdf (reference): 3 pages,
    2 tables, 2 figures, duty markers, section stubs, repeating footers,
    a near-duplicate pair (FIXTURES.md §4)."""
    spans: list[dict] = []
    off = 0
    body_a = _sentence(rng, 14)
    for page in range(3):
        spans.append(_span("text", page, 60, 50, f"2.{page + 1} {_sentence(rng, 10)}", "", off)); off += 1
        spans.append(_span("text", page, 220, 50, _sentence(rng, 16), "", off)); off += 1
        if page == 0:
            # section stub that must merge with the title below it
            spans.append(_span("text", page, 400, 50, "3.", "", off)); off += 1
            spans.append(_span("text", page, 460, 50, _sentence(rng, 6), "", off)); off += 1
            # near-duplicate pair: second must dedup away
            spans.append(_span("text", page, 520, 50, body_a, "", off)); off += 1
            spans.append(_span("noisy_text", page, 560, 50, body_a + " !!", "", off)); off += 1
        if page == 1:
            for i, m in enumerate(("3)", "4)", "5)")):
                spans.append(_span("text", page, 300 + 60 * i, 70, f"{m} {_sentence(rng, 5)}", "", off)); off += 1
            # mashed line: two duty items fused -> must split (kernel
            # _split_mashed_markers); "2 items" keeps its own block
            spans.append(_span("text", page, 500, 70,
                               f"10) {_sentence(rng, 4)} 11) {_sentence(rng, 4)}",
                               "", off)); off += 1
            grid = "h1\th2\th3\nv1\tv2\tv3\nv4\tv5\tv6"
            spans.append(_span("table", page, 600, 50, grid, "", off, w=500, h=60)); off += 1
            # stray text layer inside the table rect -> J1 suppression
            spans.append(_span("text", page, 620, 120, "v1 v2 v3 stray cell text", "", off)); off += 1
            # marker heading overlapping the rect -> exempt, kept
            spans.append(_span("text", page, 610, 60, "6) ภายในตาราง kept", "", off)); off += 1
            spans.append(_span("figure", page, 680, 50, "", kernels.encode_media("fig-a"), off, w=200, h=120)); off += 1
        if page == 2:
            grid = "a\ta\tb\nc\tc\td"  # duplicate cols must collapse
            spans.append(_span("table", page, 300, 50, grid, "", off)); off += 1
            spans.append(_span("figure", page, 500, 50, "", kernels.encode_media("fig-b"), off)); off += 1
        spans.append(_span("boiler", page, 950, 400, f"Confidential — internal draft", "", off)); off += 1
        spans.append(_span("boiler", page, 975, 480, f"Page {page + 1} of 3", "", off)); off += 1
    return spans


def _general_doc(rng: random.Random) -> list[dict]:
    spans = []
    off = 0
    for page in range(2):
        for row in range(3):
            spans.append(_span("text", page, 80 + 200 * row, 40, _sentence(rng, 12), "", off)); off += 1
    spans.insert(1, _span("text", 0, 150, 40,
                          "sentinel UNIQUE_TOKEN_ALPHA_7788 appears verbatim", "", off)); off += 1
    spans.append(_span("text", 1, 700, 40,
                       "sentinel UNIQUE_TOKEN_BETA_9911 appears verbatim", "", off)); off += 1
    return spans


def _html_doc(rng: random.Random) -> list[dict]:
    main1 = _sentence(rng, 14)
    main2 = _sentence(rng, 12)
    short = _sentence(rng, 3)
    html = (
        "<nav><li><a href='/'>home</a></li><li><a href='/x'>x</a></li></nav>"
        f"<p>{main1}</p>"
        f"<p><a href='/a'>a</a> <a href='/b'>b</a> <a href='/c'>c</a></p>"
        f"<p>{short}</p>"
        f"<p>{main2}</p>"
        "<footer>copyright 2026 example corp all rights reserved</footer>"
    )
    return [
        _span("html", 0, 100, 40, html, "", 0),
        _span("text", 0, 600, 40, _sentence(rng, 10), "", 1),
        _span("boiler", 0, 960, 400, "Page 1", "", 2),
    ]


def _image_doc(rng: random.Random) -> list[dict]:
    spans = []
    off = 0
    for row in range(3):
        payload = _sentence(rng, 8)
        spans.append(_span("image", 0, 100 + 250 * row, 60, "",
                           kernels.encode_media(payload), off)); off += 1
    spans.append(_span("figure", 0, 880, 60, "", kernels.encode_media("photo"), off, w=300, h=100)); off += 1
    spans.append(_span("figure", 0, 890, 400, "", kernels.encode_media("thumb-small"), off, w=40, h=30)); off += 1
    spans.append(_span("figure", 0, 900, 600, "", kernels.encode_media("chart-big"), off, w=350, h=90)); off += 1
    return spans


def _thai_doc(rng: random.Random) -> list[dict]:
    return [
        # Thai spacing to collapse, Thai digits to map, เเ -> แ
        _span("text", 0, 100, 40, "ภาษา ไทย ทดสอบ เเละ ๑๒๓", "", 0),
        _span("noisy_text", 0, 300, 40, _THAI_BODY + "​ ซ้ำ  ซ้อน", "", 1),
        _span("text", 0, 500, 40, _sentence(rng, 9), "", 2),
    ]


def _unreliable_doc(rng: random.Random) -> list[dict]:
    garbled = "??? ### %% ~~ ^^ || ::: ;;; !!!"
    rescue = _sentence(rng, 7)
    return [
        # unreliable text WITH media backup -> recognized from media
        _span("text", 0, 100, 40, garbled, kernels.encode_media(rescue), 0),
        # unreliable text WITHOUT backup -> dropped
        _span("text", 0, 300, 40, garbled, "", 1),
        _span("text", 0, 500, 40, _sentence(rng, 10), "", 2),
    ]


def _two_column_doc(rng: random.Random) -> list[dict]:
    spans = []
    off = 0
    # interleave emission order; reading order must be left column then right
    for row in range(3):
        spans.append(_span("text", 0, 100 + 200 * row, 80, f"L{row} {_sentence(rng, 6)}", "", off)); off += 1
        spans.append(_span("text", 0, 100 + 200 * row, 760, f"R{row} {_sentence(rng, 6)}", "", off)); off += 1
    return spans


def _neardup_doc(rng: random.Random) -> list[dict]:
    base = _sentence(rng, 20)
    return [
        _span("text", 0, 100, 40, base, "", 0),
        _span("text", 0, 300, 40, base + " trailing", "", 1),     # containment dup
        _span("noisy_text", 0, 500, 40, base.upper(), "", 2),      # norm-key dup
        _span("text", 0, 700, 40, _sentence(rng, 9), "", 3),
    ]


def _table_doc(rng: random.Random) -> list[dict]:
    g1 = "name\tqty\tprice\n" + "\n".join(
        f"item{j}\t{rng.randint(1, 9)}\t{rng.randint(10, 99)}" for j in range(4))
    g2 = "x\t\ty\n1\t\t2\n3\t\t4"  # empty middle column must drop
    return [
        _span("text", 0, 80, 40, _sentence(rng, 8), "", 0),
        _span("table", 0, 300, 40, g1, "", 1),
        _span("table", 1, 200, 40, g2, "", 2),
        _span("boiler", 0, 960, 420, "Page 1 of 2", "", 3),
        _span("boiler", 1, 960, 420, "Page 2 of 2", "", 4),
    ]


def _grid_table_doc(rng: random.Random) -> list[dict]:
    """M8/M9 grid-table fixtures: spanned header, rowspan, a garble cell
    (must drop), an uncovered slot filled from the media backup, and a
    3-column grid with duplicated leading columns (must collapse 3->2)."""
    g1 = "\n".join([
        "grid:3,3",
        "0,0,1,3|Inventory summary",          # colspan-3 header
        "1,0,3,1|หมวด",                        # rowspan-2 label
        "1,1|Printer",
        "1,2|12",
        "2,1|XKQJWPTRZ BNMKL",                # OCR soup -> dropped
        # (2,2) left uncovered -> media fill offers "7"
    ])
    fill1 = kernels.encode_media("2,2|7")
    g2 = "\n".join([                           # duplicate leading cols
        "grid:2,3",
        "0,0|item", "0,1|item", "0,2|qty",
        "1,0|disk", "1,1|disk", "1,2|4",
    ])
    g3 = "\n".join([                           # implausible fill rejected
        "grid:1,2",
        "0,0|Total",
    ])
    fill3 = kernels.encode_media("0,1|~~~~")
    # gridless table: loose positioned items clustered into rows (W5)
    loose = kernels.encode_media_segments([
        (300.0, 100.0, 120.0, "qty"),
        (40.0, 102.0, 118.0, "name"),
        (40.0, 200.0, 220.0, "bolt"),
        (300.0, 198.0, 222.0, "12"),
        (40.0, 260.0, 280.0, "nut"),           # short row -> padded
    ])
    return [
        _span("text", 0, 80, 40, _sentence(rng, 8), "", 0),
        _span("table", 0, 200, 40, g1, fill1, 1, w=500, h=200),
        _span("table", 0, 500, 40, g2, "", 2, w=500, h=100),
        _span("table", 1, 200, 40, g3, fill3, 3, w=300, h=60),
        _span("table", 1, 500, 40, "", loose, 4, w=400, h=200),
        _span("boiler", 0, 960, 420, "Page 1 of 2", "", 5),
    ]


def _segments_doc(rng: random.Random) -> list[dict]:
    """W3 fixtures: a multi-segment recognize payload whose segments
    arrive out of order — two lines, the first with a Thai join pair and
    an x-sorted pair, the second a single segment."""
    segs = [
        (400.0, 102.0, 118.0, "ไท"),           # line 1, right part (Thai join)
        (300.0, 100.0, 120.0, "ภาษา"),         # line 1, mid (Thai->Thai no space)
        (40.0, 104.0, 117.0, "heading"),       # line 1, leftmost
        (40.0, 160.0, 180.0, "second visual line"),
        (500.0, 163.0, 181.0, "tail"),         # same line 2 by y-center
    ]
    return [
        _span("image", 0, 100, 40, "", kernels.encode_media_segments(segs), 0),
        _span("text", 0, 400, 40, _sentence(rng, 9), "", 1),
    ]


def _band_doc(rng: random.Random) -> list[dict]:
    """M11 fixtures: duty list with 5) missing from the text layer; a
    recovery band supplies it. A band for the present 4) must be
    dropped (additive-only), and a thin band fails the substance gate."""
    spans = []
    off = 0
    for i, m in enumerate(("3)", "4)", "6)")):
        spans.append(_span("text", 0, 200 + 60 * i, 60,
                           f"{m} {_sentence(rng, 6)}", "", off)); off += 1
    spans.append(_span("band", 0, 260, 58, "",
                       kernels.encode_media(f"5) {_sentence(rng, 7)}"), off)); off += 1
    spans.append(_span("band", 0, 230, 58, "",
                       kernels.encode_media(f"4) {_sentence(rng, 7)}"), off)); off += 1
    spans.append(_span("band", 0, 290, 58, "",
                       kernels.encode_media("9) ok"), off)); off += 1
    return spans


def _weak_primary_doc(rng: random.Random) -> list[dict]:
    """J2 fixtures: a weak embedded-text primary whose bbox contains a
    much richer OCR secondary -> the secondary's text replaces it; an
    equally-sized secondary elsewhere stays a separate block."""
    rich = _sentence(rng, 12)
    return [
        _span("text", 0, 100, 40, "brief note", "", 0, w=600, h=40),
        _span("image", 0, 110, 60, "", kernels.encode_media(rich), 1, w=300, h=20),
        _span("text", 0, 300, 40, _sentence(rng, 10), "", 2, w=600, h=40),
    ]


def _page_image_doc(rng: random.Random) -> list[dict]:
    """M1/M3 fixtures: one full-page recognize payload segmented into
    blocks by line-gap analysis, plus a 'figure' whose content forms a
    grid (M4 reclassify -> table) and one that stays a real figure."""
    page_segs = [
        (40.0, 80.0, 100.0, "Document heading line"),
        # paragraph block: three tight lines (gap < 1.5 x line height)
        (40.0, 180.0, 200.0, "first paragraph line"),
        (40.0, 205.0, 225.0, "second paragraph line"),
        (40.0, 230.0, 250.0, "third paragraph line"),
        # big gap -> a separate closing block
        (40.0, 500.0, 520.0, _sentence(rng, 6)),
    ]
    grid_segs = [                  # 2x2 -> reclassified to table
        (60.0, 100.0, 120.0, "qty"),
        (260.0, 100.0, 120.0, "price"),
        (60.0, 200.0, 220.0, "4"),
        (260.0, 200.0, 220.0, "99"),
    ]
    column_segs = [                # single column -> stays a figure
        (60.0, 100.0, 120.0, "legend"),
        (60.0, 300.0, 320.0, "axis"),
    ]
    # TWO-COLUMN full-page payload (round-3 adversarial fixture): the
    # columns occupy disjoint y-bands, so line clustering yields four
    # separate blocks (two per column) and the XY-cut column split in
    # sort_reading_order becomes load-bearing — final order must be
    # left column top-to-bottom THEN right column, not global y-order.
    twocol_segs = [
        (40.0, 100.0, 120.0, "Lcol intro alpha"),
        (40.0, 130.0, 150.0, "Lcol intro beta"),   # tight gap: same block
        (700.0, 250.0, 270.0, "Rcol first block"),
        (40.0, 400.0, 420.0, "Lcol second block"),
        (700.0, 600.0, 620.0, "Rcol closing block"),
    ]
    return [
        _span("page_image", 0, 60, 30, "",
              kernels.encode_media_segments(page_segs), 0),
        _span("figure", 1, 200, 40, "",
              kernels.encode_media_segments(grid_segs), 1, w=400, h=200),
        _span("figure", 1, 600, 40, "",
              kernels.encode_media_segments(column_segs), 2, w=300, h=260),
        _span("page_image", 2, 60, 30, "",
              kernels.encode_media_segments(twocol_segs), 3),
    ]


def _detections_base_doc(rng: random.Random) -> list[dict]:
    """Text-only base doc for the external-detections fixture: a body
    paragraph, a stray caption + an exempt duty marker that fall inside
    the incoming table detection's rect, and a page-1 paragraph."""
    return [
        _span("text", 0, 200, 50, _sentence(rng, 10), "", 0),
        # stray caption: center (120, 420) inside the (40,400)+520x80
        # table detection -> J1 suppression (override)
        _span("text", 0, 420, 120, "stray caption inside detected table", "", 1),
        # duty marker inside the same rect -> J1 exemption, kept
        _span("text", 0, 410, 60, f"7) {_sentence(rng, 4)}", "", 2),
        _span("text", 1, 300, 40, _sentence(rng, 9), "", 3),
    ]


def gen_detections_corpus(n_docs: int = 6, seed: int = 91):
    """(corpus, detections) for the M1/M2 external-detections seam:
    detection rows are ``(doc_id, page, x, y, w, h, cls, conf,
    media_ref)`` — the shape a YOLO/Docling layout batch job emits.
    Exercises every override-vs-merge branch: J1 text suppression under
    a high-conf table, marker exemption, P9 undersized-figure drop,
    confidence gating, M4 crop-grid reclassify, a no-detections doc,
    and a detection aimed at a doc that is not in the corpus."""
    corpus: list[tuple[str, list[dict]]] = []
    dets: list[tuple] = []
    for k in range(n_docs):
        rng = random.Random(seed * 20_011 + k)
        doc_id = f"det-{k:03d}"
        corpus.append((doc_id, _detections_base_doc(rng)))
        if k % 3 == 2:
            continue                   # no detections: pure pass-through
        table_items = kernels.encode_media_segments([
            (300.0, 428.0, 448.0, f"n{10 + k}"),
            (60.0, 430.0, 450.0, "part"),
            (60.0, 470.0, 490.0, f"bolt{k}"),
            (300.0, 468.0, 488.0, str(rng.randint(2, 9))),
        ])
        dets += [
            # override: high-conf table covering the stray caption
            (doc_id, 0, 40.0, 400.0, 520.0, 80.0, "table", 0.93, table_items),
            # merge: a clean figure elsewhere on page 1
            (doc_id, 1, 40.0, 600.0, 300.0, 120.0, "figure", 0.88,
             kernels.encode_media(f"det-photo-{k}")),
            # gated out: below the detector confidence threshold
            (doc_id, 0, 600.0, 700.0, 200.0, 100.0, "figure", 0.31,
             kernels.encode_media("low-conf")),
            # P9 validity drop: bbox under the 40px side minimum
            (doc_id, 1, 400.0, 600.0, 10.0, 8.0, "figure", 0.95, ""),
            # degenerate zero-area bbox: gated out before injection
            (doc_id, 0, 100.0, 500.0, 0.0, 0.0, "figure", 0.99, ""),
        ]
        if k % 2 == 0:
            # M4: figure detection whose crop segments form a 2x2 grid;
            # y=100.25 pins the cross-engine %.1f HALF_UP rounding
            # (Java '410.3'-style, not Python's half-even '410.2')
            dets.append((doc_id, 1, 40.0, 100.25, 400.0, 200.0, "figure", 0.9,
                         kernels.encode_media_segments([
                             (60.0, 120.0, 140.0, "qty"),
                             (260.0, 120.0, 140.0, "price"),
                             (60.0, 220.0, 240.0, str(4 + k)),
                             (260.0, 220.0, 240.0, str(90 + k)),
                         ])))
    # a detection for a doc that is not in the corpus -> ignored
    dets.append(("det-missing-999", 0, 40.0, 100.0, 200.0, 100.0,
                 "figure", 0.99, ""))
    return corpus, dets


def _fmt1_half_up(v: float) -> str:
    """Java Formatter's %.1f (RoundingMode.HALF_UP on the decimal repr)
    — NOT Python's f'{v:.1f}', which rounds half-even: 410.25 must
    format as '410.3' on both engines."""
    from decimal import ROUND_HALF_UP, Decimal
    return str(Decimal(repr(float(v))).quantize(Decimal("0.1"),
                                                rounding=ROUND_HALF_UP))


def apply_detections_seq(corpus, dets, min_conf: float = 0.5):
    """Sequential mirror of job.inject_external_detections: gate on
    conf AND positive bbox area, sort per doc by (page, y, x), append
    as structure spans with offsets in the 2M namespace. The header is
    built explicitly (always including w/h, HALF_UP rounding) to be
    byte-identical to the Spark side's
    format_string('p=%d;y=%.1f;x=%.1f;w=%.1f;h=%.1f|') — _span's
    conditional w/h suffix and Python's half-even %.1f both diverge."""
    by_doc: dict[str, list[tuple]] = {}
    for (doc_id, page, x, y, w, h, cls, conf, media_ref) in dets:
        if conf < min_conf or w <= 0 or h <= 0:
            continue
        by_doc.setdefault(doc_id, []).append((page, y, x, w, h, cls, media_ref))
    out = []
    for doc_id, spans in corpus:
        extra = []
        for i, (page, y, x, w, h, cls, media_ref) in enumerate(
                sorted(by_doc.get(doc_id, []))):
            header = (f"p={page};y={_fmt1_half_up(y)};x={_fmt1_half_up(x)};"
                      f"w={_fmt1_half_up(w)};h={_fmt1_half_up(h)}|")
            extra.append({"kind": cls, "text": header,
                          "media_ref": media_ref,
                          "offset": 2_000_000 + i + 1})
        out.append((doc_id, list(spans) + extra))
    return out


_DOC_BUILDERS = (
    _demo_doc, _general_doc, _html_doc, _image_doc, _thai_doc,
    _unreliable_doc, _two_column_doc, None, _neardup_doc, _table_doc,
    _grid_table_doc, _segments_doc, _band_doc, _weak_primary_doc,
    _page_image_doc,
)


def gen_doc(i: int, seed: int = 42) -> tuple[str, list[dict]]:
    """One deterministic document; stable regardless of corpus size."""
    doc_id = f"doc-{i:06d}"
    rng = random.Random(seed * 1_000_003 + i)
    builder = _DOC_BUILDERS[i % len(_DOC_BUILDERS)]
    if builder is None:
        # edge docs: mostly small mixed, occasionally empty / media-only
        # (moduli chosen so each variant appears among the i%15==7 slots
        # of the 48-doc golden corpus: 7 empty, 22 media-only, 37 wrapped)
        if i % 50 == 7:
            return doc_id, []
        if i % 30 == 22:
            return doc_id, [_span("figure", 0, 400, 100, "",
                                  kernels.encode_media("lonely"), 0)]
        if i % 30 == 7:
            # wrapped lines: small gaps + line heights -> W4 paragraph merge
            return doc_id, [
                _span("text", 0, 100, 40, _sentence(rng, 8), "", 0, w=600, h=30),
                _span("text", 0, 135, 42, _sentence(rng, 8), "", 1, w=600, h=30),
                _span("text", 0, 170, 40, _sentence(rng, 6), "", 2, w=400, h=30),
                # big gap -> new paragraph
                _span("text", 0, 400, 40, _sentence(rng, 7), "", 3, w=600, h=30),
                _span("text", 0, 436, 40, _sentence(rng, 5), "", 4, w=500, h=30),
            ]
        return doc_id, [
            _span("text", 0, 100, 40, _sentence(rng, 11), "", 0),
            _span("text", 0, 400, 40, _sentence(rng, 7), "", 1),
        ]
    return doc_id, builder(rng)


_KIND_BUILDERS = {
    "grid": _grid_table_doc,
    "segments": _segments_doc,
    "band": _band_doc,
    "weak": _weak_primary_doc,
    "page": _page_image_doc,
}


def gen_kind_corpus(name: str, n_docs: int = 6, seed: int = 77) -> list[tuple[str, list[dict]]]:
    """Focused corpus of one fixture family (operator-specific driver
    queries); deterministic per (name, seed, index)."""
    builder = _KIND_BUILDERS[name]
    return [(f"{name}-{k:03d}", builder(random.Random(seed * 10_007 + k)))
            for k in range(n_docs)]


def gen_corpus(n_docs: int = 200, seed: int = 42, skew: bool = False) -> list[tuple[str, list[dict]]]:
    docs = []
    for i in range(n_docs):
        doc_id, spans = gen_doc(i, seed)
        if skew and i % 100 == 99:
            # 50x span-count tail to exercise the salted repartition
            fat = list(spans)
            rng = random.Random(seed * 7_000_003 + i)
            base = len(fat)
            for k in range(50 * max(1, base)):
                page = 3 + k // 6
                y = 80.0 + (k % 6) * 150
                fat.append(_span("text", page, y, 40, _sentence(rng, 10), "", base + k))
            spans = fat
        docs.append((doc_id, spans))
    return docs


def gen_boilerplate_cluster_docs(n_hot: int = 1200, seed: int = 33
                                 ) -> list[tuple[int, str]]:
    """Flat (doc_id, text) rows where a boilerplate sentence is shared
    by EVERY doc — its 3-gram shingles have df = n_hot, so with
    n_hot > SHINGLE_DF_CAP the df cap genuinely binds (on the driver's
    sf0.01 corpus it is a no-op, which a pytest pins). Docs 0 and 1 are
    a true near-dup pair through their sub-cap unique shingles, proving
    the cap drops ONLY the quadratic boilerplate bucket, not recall."""
    rng = random.Random(seed)
    boiler = "subscribe to our newsletter for updates and exclusive offers"
    shared = _sentence(rng, 14)           # the near-dup pair's payload
    docs = []
    for i in range(n_hot):
        if i == 0:
            body = shared
        elif i == 1:
            body = shared + " trailing"
        else:
            body = f"story{i} item{i} body{i} text{i} tail{i}"
        docs.append((i, f"{boiler} {body}"))
    return docs


# --------------------------------------------------------------------------
# Derivation from the driver's flat documents table (for entry()/bench)
# --------------------------------------------------------------------------


def spans_from_flat_doc(doc_id: int, text: str) -> list[dict]:
    """Deterministically interleave one flat document's text into the
    input_hint span shape: chunked positioned text spans, a repeating
    boiler footer per page, and — keyed by pure doc_id arithmetic — an
    image span (reversible payload), an html fragment, a table, and a
    figure. Pure function: safe inside mapInPandas."""
    words = (text or "").split()
    if not words:
        return []
    chunks = [" ".join(words[i:i + 12]) for i in range(0, len(words), 12)]
    spans: list[dict] = []
    off = 0
    pages = set()
    for idx, chunk in enumerate(chunks):
        page = idx // 4
        pages.add(page)
        y = 80.0 + (idx % 4) * 180
        if doc_id % 4 == 1 and idx == 1:
            html = (
                "<nav><a href='/'>home</a> <a href='/about'>about</a></nav>"
                f"<p>{chunk} {chunk}</p>"
                "<footer>copyright corp</footer>"
            )
            spans.append(_span("html", page, y, 60, html, "", off))
        elif doc_id % 3 == 0 and idx == 2:
            spans.append(_span("image", page, y, 60, "", kernels.encode_media(chunk), off))
        elif doc_id % 5 == 2 and idx == 3:
            ws = chunk.split()
            half = max(1, len(ws) // 2)
            grid = "\t".join(ws[:half]) + "\n" + "\t".join(ws[half:] or ["-"])
            spans.append(_span("table", page, y, 60, grid, "", off))
        elif doc_id % 11 == 4 and idx == 4:
            # grid-table span with a spanned header + media slot fill
            ws = chunk.split()
            half = max(1, len(ws) // 2)
            grid = ("grid:2,2\n0,0,1,2|" + " ".join(ws[:half])
                    + "\n1,0|" + " ".join(ws[half:] or ["-"]))
            fill = kernels.encode_media(f"1,1|{doc_id % 97}")
            spans.append(_span("table", page, y, 60, grid, fill, off))
        elif doc_id % 13 == 6 and idx == 5:
            # multi-segment recognize payload (one visual line per word pair)
            ws = chunk.split()[:6] or ["-"]
            segs = [(40.0 + 30.0 * k, 100.0 + 40.0 * (k // 2),
                     118.0 + 40.0 * (k // 2), w) for k, w in enumerate(ws)]
            spans.append(_span("image", page, y, 60, "",
                               kernels.encode_media_segments(segs), off))
        else:
            spans.append(_span("noisy_text" if (doc_id + idx) % 7 == 3 else "text",
                               page, y, 60, chunk, "", off))
        off += 1
    if doc_id % 7 == 3:
        spans.append(_span("figure", 0, 900, 60, "", kernels.encode_media(f"fig-{doc_id}"), off))
        off += 1
    for page in sorted(pages):
        spans.append(_span("boiler", page, 960, 400, f"Page {page + 1}", "", off))
        off += 1
    return spans
