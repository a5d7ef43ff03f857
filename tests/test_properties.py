"""Property-based tests (hypothesis) for the kernel pipeline — coverage
the reference never had (SURVEY.md §5: "No property-based/randomized
testing"). No SparkSession needed: kernels are pure."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from local_pdftodocx_ocr_spark import kernels

KINDS = ["text", "noisy_text", "boiler", "html", "image", "figure", "table",
         "band", "junk_kind", ""]

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
    max_size=200,
)


def _span_strategy():
    def build(kind, page, y, x, body, with_media, offset):
        header = f"p={page};y={y:.1f};x={x:.1f}|"
        media = kernels.encode_media(body[:40]) if with_media else ""
        return {"kind": kind, "text": header + body, "media_ref": media,
                "offset": offset}

    return st.builds(
        build,
        kind=st.sampled_from(KINDS),
        page=st.integers(0, 5),
        y=st.floats(0, 999, allow_nan=False),
        x=st.floats(0, 999, allow_nan=False),
        body=_text,
        with_media=st.booleans(),
        offset=st.integers(0, 1000),
    )


_raw_span = st.fixed_dictionaries({
    "kind": st.sampled_from(KINDS),
    "text": _text,  # headerless / garbage headers included
    "media_ref": st.one_of(st.just(""), _text.map(lambda s: "mem:" + s[:20])),
    "offset": st.integers(-5, 10_000),
})

_doc = st.lists(st.one_of(_span_strategy(), _raw_span), max_size=25)


class TestExtractProperties:
    @given(_doc)
    @settings(max_examples=150, deadline=None)
    def test_never_crashes_and_offsets_dense(self, spans):
        out = kernels.extract_document("doc-x", spans)
        assert [o for (_, _, _, o) in out] == list(range(len(out)))
        for kind, text, media_ref, _ in out:
            assert kind in ("text", "table", "figure")
            assert isinstance(text, str) and isinstance(media_ref, str)

    @given(_doc)
    @settings(max_examples=100, deadline=None)
    def test_deterministic(self, spans):
        a = kernels.extract_document("doc-x", spans)
        b = kernels.extract_document("doc-x", [dict(s) for s in spans])
        assert a == b

    @given(_doc, st.integers(1, 7))
    @settings(max_examples=100, deadline=None)
    def test_chunked_equals_direct(self, spans, chunk):
        """route-per-chunk + finalize == single-pass extract, for ANY
        chunk size — the invariant the skew path depends on."""
        direct = kernels.extract_document("doc-x", spans)
        blocks = []
        for i in range(0, max(len(spans), 1), chunk):
            blocks.extend(kernels.route_spans(spans[i:i + chunk], base_seq=i))
        blocks.sort(key=lambda b: b.seq)
        assert kernels.finalize_blocks(blocks) == direct

    @given(_doc)
    @settings(max_examples=60, deadline=None)
    def test_media_cache_equivalence(self, spans):
        refs = sorted({s.get("media_ref", "") for s in spans if s.get("media_ref")})
        cache = dict(zip(refs, kernels.recognize_batch(refs)))
        assert kernels.extract_document("d", spans, cache) == \
            kernels.extract_document("d", spans)


class TestCleanTextProperties:
    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, s):
        once = kernels.clean_text(s)
        assert kernels.clean_text(once) == once

    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_no_control_chars_survive(self, s):
        out = kernels.clean_text(s)
        assert not any(ord(c) < 32 and c not in "\n" for c in out)

    @given(_text)
    @settings(max_examples=100, deadline=None)
    def test_norm_key_punct_whitespace_insensitive(self, s):
        # NB: upper/lower round-trips are NOT identity in Unicode
        # (hypothesis found µ -> Μ -> μ), so the invariant is only
        # punctuation/whitespace insensitivity + lowercase idempotence
        assert kernels.text_norm_key("  " + s + " !!,") == kernels.text_norm_key(s)
        assert kernels.text_norm_key(s.lower()) == kernels.text_norm_key(s)


class TestCodecProperties:
    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_recognize_roundtrip(self, s):
        assert kernels.recognize_one(kernels.encode_media(s)) == s

    @given(st.text(max_size=50))
    @settings(max_examples=100, deadline=None)
    def test_recognize_never_crashes_on_garbage(self, s):
        kernels.recognize_one("mem:" + s)
        kernels.recognize_one(s)


class TestGridSegmentsProperties:
    @given(_text)
    @settings(max_examples=150, deadline=None)
    def test_grid_parse_never_crashes(self, s):
        g = kernels.parse_grid_table(s)
        if g is not None:
            out = kernels.grid_table_text(*g, fill_payload=s)
            assert isinstance(out, str)

    @given(st.integers(0, 4), st.integers(0, 4),
           st.lists(st.tuples(st.integers(-2, 6), st.integers(-2, 6),
                              st.integers(-2, 8), st.integers(-2, 8), _text),
                    max_size=12))
    @settings(max_examples=150, deadline=None)
    def test_grid_text_total_on_any_entries(self, nr, nc, entries):
        out = kernels.grid_table_text(nr, nc, [list(e) for e in entries])
        assert isinstance(out, str)

    @given(_text)
    @settings(max_examples=150, deadline=None)
    def test_segments_payload_parse_total(self, s):
        segs = kernels.parse_segments_payload(s)
        if segs is not None:
            lines = kernels.segments_to_lines(segs)
            assert all(isinstance(ln, str) and ln for ln in lines)

    @given(st.lists(st.tuples(st.floats(-1e3, 1e3, allow_nan=False),
                              st.floats(-1e3, 1e3, allow_nan=False),
                              st.floats(-1e3, 1e3, allow_nan=False), _text),
                    max_size=15))
    @settings(max_examples=150, deadline=None)
    def test_segments_to_lines_deterministic(self, segs):
        a = kernels.segments_to_lines(list(segs))
        b = kernels.segments_to_lines(list(segs))
        assert a == b
        assert kernels.items_to_table(list(segs)) == kernels.items_to_table(list(segs))

    @given(st.lists(
        st.tuples(st.floats(-1e3, 1e3, allow_nan=False),
                  st.floats(-1e3, 1e3, allow_nan=False),
                  st.floats(0, 100, allow_nan=False), _text)
        .map(lambda t: (t[0], t[1], t[1] + t[2], t[3])),  # y1 >= y0
        max_size=15))
    @settings(max_examples=120, deadline=None)
    def test_page_segmentation_total_and_deterministic(self, segs):
        blocks = kernels.segment_page_blocks(list(segs))
        assert blocks == kernels.segment_page_blocks(list(segs))
        assert all(t for (_, _, t) in blocks)
        # every line survives into exactly one block, in line order
        assert "\n".join(t for (_, _, t) in blocks) == \
            "\n".join(kernels.segments_to_lines(list(segs)))
        # degenerate segments (y1 < y0) must still be total
        kernels.segment_page_blocks([(0.0, 5.0, -5.0, "x"), (1.0, 0.0, 1.0, "y")])

    @given(st.lists(st.tuples(st.floats(0, 999, allow_nan=False),
                              st.floats(0, 999, allow_nan=False),
                              st.floats(0, 999, allow_nan=False),
                              st.text(alphabet=st.characters(
                                  blacklist_categories=("Cs",),
                                  blacklist_characters="\n|,"), max_size=30)),
                    max_size=10))
    @settings(max_examples=100, deadline=None)
    def test_segments_codec_roundtrip(self, segs):
        ref = kernels.encode_media_segments(list(segs))
        parsed = kernels.parse_segments_payload(kernels.recognize_one(ref))
        assert [s[3] for s in parsed] == [s[3] for s in segs]


class TestChecksumProperties:
    @given(st.lists(st.integers(0, (1 << 61) - 2), max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_combine_order_insensitive(self, vals):
        assert kernels.combine_checksums(vals) == \
            kernels.combine_checksums(list(reversed(vals)))

    @given(st.lists(st.integers(0, (1 << 61) - 2), max_size=20),
           st.integers(0, 10))
    @settings(max_examples=100, deadline=None)
    def test_combine_partition_invariant(self, vals, split):
        """combine(combine(A), combine(B)) == combine(A+B) — why the
        global checksum is stable across any partitioning."""
        k = min(split, len(vals))
        a, b = vals[:k], vals[k:]
        partial = [int(kernels.combine_checksums(a), 16),
                   int(kernels.combine_checksums(b), 16)]
        assert kernels.combine_checksums(partial) == kernels.combine_checksums(vals)


class TestMankuKeyProperties:
    """Pure-Python mirror of dedup._manku_keys' packing arithmetic:
    the pigeonhole (hamming<=3 -> some block-triple key shared) and
    injectivity of the (combo, v_i, v_j, v_k) -> long packing."""

    @staticmethod
    def _keys(sig: int) -> set[int]:
        from local_pdftodocx_ocr_spark.operators.dedup import (
            SIMHASH_BLOCK_OFFSETS,
            SIMHASH_BLOCK_WIDTHS,
            SIMHASH_COMBOS,
        )
        sig &= (1 << 64) - 1
        blocks = [(sig >> off) & ((1 << w) - 1)
                  for off, w in zip(SIMHASH_BLOCK_OFFSETS, SIMHASH_BLOCK_WIDTHS)]
        return {((ci * 2048 + blocks[a]) * 2048 + blocks[b]) * 2048 + blocks[c]
                for ci, (a, b, c) in enumerate(SIMHASH_COMBOS)}

    @given(sig=st.integers(0, (1 << 64) - 1),
           flips=st.lists(st.integers(0, 63), min_size=0, max_size=3))
    @settings(max_examples=300, deadline=None)
    def test_hamming_le_3_always_shares_a_key(self, sig, flips):
        other = sig
        for b in flips:
            other ^= 1 << b
        assert self._keys(sig) & self._keys(other), \
            f"pigeonhole violated: {sig:016x} vs {other:016x}"

    @given(sig=st.integers(0, (1 << 64) - 1),
           flips=st.sets(st.integers(0, 63), min_size=4, max_size=64))
    @settings(max_examples=300, deadline=None)
    def test_four_spread_flips_in_four_blocks_never_share(self, sig, flips):
        """If the flipped bits touch >= 4 DISTINCT blocks, no triple of
        agreeing blocks exists -> key sets must be disjoint (this is
        what makes bucket occupancy ~n/2^32, not just correctness)."""
        from local_pdftodocx_ocr_spark.operators.dedup import (
            SIMHASH_BLOCK_OFFSETS,
            SIMHASH_BLOCK_WIDTHS,
        )

        def block_of(bit):
            for i, (off, w) in enumerate(zip(SIMHASH_BLOCK_OFFSETS,
                                             SIMHASH_BLOCK_WIDTHS)):
                if off <= bit < off + w:
                    return i
            raise AssertionError(bit)

        touched = {block_of(b) for b in flips}
        if len(touched) < 4:
            return  # pigeonhole still possible; nothing to assert
        other = sig
        for b in flips:
            other ^= 1 << b
        assert not (self._keys(sig) & self._keys(other))

    @given(sig=st.integers(0, (1 << 64) - 1))
    @settings(max_examples=200, deadline=None)
    def test_packing_is_injective_and_ansi_safe(self, sig):
        keys = self._keys(sig)
        assert len(keys) == 20          # no combo collides with another
        assert all(0 <= k < (1 << 62) for k in keys)


class TestStarComponentsProperty:
    """VERDICT r3 #8: a corpus whose near-dup graph resists the 64-round
    star bound is impossible (O(log^2 n) rounds), but pin it empirically:
    random >=10^4-node graphs through the distributed
    large-star/small-star loop must (a) produce exactly the sequential
    union-find's min-member labels and (b) converge within
    2*log2(n)^2 rounds."""

    @staticmethod
    def _drive(spark, n, edges):
        import math

        from pyspark.sql import functions as F

        import local_pdftodocx_ocr_spark.operators.dedup as dd
        from local_pdftodocx_ocr_spark import seq_oracles

        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        e = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], "doc1 long, doc2 long")
        got = {r["doc_id"]: r["component"]
               for r in dd._star_components(nodes, e).collect()}
        exp = seq_oracles.seq_union_find(range(n), edges)
        assert got == exp
        bound = 2 * math.log2(n) ** 2
        assert dd.LAST_STAR_ROUNDS <= bound, \
            f"{dd.LAST_STAR_ROUNDS} rounds > {bound:.0f} for n={n}"

    @given(seed=st.integers(0, 2**32 - 1),
           avg_degree=st.sampled_from([0.5, 1.0, 2.0]))
    @settings(max_examples=3, deadline=None)
    def test_random_graph_matches_union_find(self, spark, seed, avg_degree):
        """Erdos-Renyi-ish multigraphs across the sub/near/super-critical
        densities (components go from dust to a giant component)."""
        import numpy as np

        n = 10_000
        rng = np.random.default_rng(seed)
        m = int(n * avg_degree / 2)
        edges = rng.integers(0, n, size=(m, 2)).tolist()
        self._drive(spark, n, edges)

    def test_long_path_10k_nodes(self, spark):
        """Diameter 9999 — the adversarial shape for propagation-style
        CC (min-label needs 10^4 rounds); star must still land every
        node on component 0 in O(log^2 n) rounds."""
        n = 10_000
        self._drive(spark, n, [(i, i + 1) for i in range(n - 1)])


class TestSimhashConnectivityEdgesProperty:
    """The reduced edge set (stars per identical-signature cluster + one
    representative edge per close signature pair) must have EXACTLY the
    same transitive closure as the full hamming<=3 pair expansion — on
    random signature multisets with planted duplicate clusters and
    near-miss signatures."""

    @given(seed=st.integers(0, 2**32 - 1))
    @settings(max_examples=5, deadline=None)
    def test_closure_equals_full_pair_graph(self, spark, seed):
        import random as _random

        from local_pdftodocx_ocr_spark import seq_oracles
        from local_pdftodocx_ocr_spark.operators import dedup as dd

        rng = _random.Random(seed)
        sigs = []
        doc = 0
        base_sigs = [rng.getrandbits(64) for _ in range(12)]
        for b in base_sigs:
            # a duplicate cluster of random size on the exact signature
            for _ in range(rng.randint(1, 6)):
                sigs.append((doc, b)); doc += 1
            # a few hamming-1..4 neighbors (some inside, some outside
            # the <=3 candidate threshold)
            for _ in range(rng.randint(0, 3)):
                flips = rng.sample(range(64), rng.randint(1, 4))
                v = b
                for f in flips:
                    v ^= 1 << f
                sigs.append((doc, v)); doc += 1
        to_i64 = lambda v: v - (1 << 64) if v >= (1 << 63) else v  # noqa: E731
        df = spark.createDataFrame(
            [(d, to_i64(s)) for d, s in sigs], "doc_id long, simhash long")
        nodes = spark.range(doc).selectExpr("id as doc_id")

        full = dd.simhash_candidate_pairs(df).select("doc1", "doc2")
        reduced = dd._simhash_connectivity_edges(df)
        f_edges = [(r["doc1"], r["doc2"]) for r in full.collect()]
        r_edges = [(r["doc1"], r["doc2"]) for r in reduced.collect()]
        dd.release_caches()
        exp = seq_oracles.seq_union_find(range(doc), f_edges)
        got = seq_oracles.seq_union_find(range(doc), r_edges)
        assert got == exp
        # and the reduction is genuinely smaller once clusters exist
        assert len(r_edges) <= len(f_edges)


class TestMd5MirrorProperties:
    """The engine's cross-engine determinism rests on md5-derived
    integer expressions hashing IDENTICALLY in Spark, DuckDB, and
    hashlib. The query oracles pin the Spark-vs-DuckDB leg on the test
    corpora; these properties pin the Spark-vs-hashlib leg on random
    unicode keys — the sequential-mirror contract the seq_oracles and
    fixture tests (bloom python mirror, HLL estimator) assume."""

    _keys = st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                max_size=60),
        min_size=1, max_size=40, unique=True)

    @given(_keys)
    @settings(max_examples=4, deadline=None)
    def test_hll_bucket_rho_matches_hashlib(self, spark, keys):
        import hashlib

        from pyspark.sql import functions as F

        from local_pdftodocx_ocr_spark.functions.hashing import hll_bucket_rho

        df = spark.createDataFrame([(k,) for k in keys], "s string")
        bucket, rho = hll_bucket_rho(F.col("s"), 8)
        got = {r["s"]: (r["b"], r["r"]) for r in
               df.select("s", bucket.alias("b"), rho.alias("r")).collect()}
        for k in keys:
            h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
            rem = h >> 8
            exp_rho = 53 if rem == 0 else 53 - rem.bit_length()
            assert got[k] == (h % 256, exp_rho), k

    @given(_keys)
    @settings(max_examples=4, deadline=None)
    def test_bloom_positions_match_hashlib(self, spark, keys):
        import hashlib

        from pyspark.sql import functions as F

        from local_pdftodocx_ocr_spark.operators import dedup

        df = spark.createDataFrame([(k,) for k in keys], "k string")
        out = df.select(
            "k", dedup._bloom_positions(F.col("k")).alias("pos")).collect()
        for r in out:
            exp = [int(hashlib.md5((r["k"] + f"bloom{i}").encode())
                       .hexdigest()[:15], 16) % dedup.BLOOM_M
                   for i in range(dedup.BLOOM_K)]
            assert list(r["pos"]) == exp, r["k"]
