"""Idempotent resume-from-snapshot (north rule; FIXTURES.md §3 §5):
kill-after-partial-commit then rerun converges to the identical table."""

from __future__ import annotations

from local_pdftodocx_ocr_spark import job, oracle, synth
from local_pdftodocx_ocr_spark.catalog import SnapshotTable


def _final_table(spark, out):
    return {
        r["doc_id"]: tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                           for s in r["spans"])
        for r in job.read_extracted(spark, out).collect()
    }


def test_partial_commit_then_resume_converges(spark, tmp_path):
    corpus = synth.gen_corpus(80)
    out_partial = str(tmp_path / "partial")
    out_full = str(tmp_path / "full")

    # simulated kill: only the first half of the input was committed
    half = job.docs_df_from_corpus(spark, corpus[:40])
    job.run_job(spark, half, out_partial, num_partitions=4)

    # restart with the FULL input; resume must process only the remainder
    stats = job.run_job(spark, job.docs_df_from_corpus(spark, corpus),
                        out_partial, num_partitions=4)
    assert stats["docs_in"] == 40

    # one-shot run for comparison
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out_full,
                num_partitions=4)

    assert _final_table(spark, out_partial) == _final_table(spark, out_full)


def test_rerun_is_noop(spark, tmp_path):
    corpus = synth.gen_corpus(30)
    out = str(tmp_path / "noop")
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out)
    stats = job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out)
    assert stats["docs_in"] == 0 and stats["docs_out"] == 0


def test_aborted_staging_invisible(spark, tmp_path):
    """Uncommitted staging data must not be readable (atomic commit)."""
    corpus = synth.gen_corpus(20)
    out = str(tmp_path / "abort")
    table = SnapshotTable(out)
    snap_id, staging = table.begin()
    unified = job.extract_spans(job.docs_df_from_corpus(spark, corpus),
                                num_partitions=2)
    unified.write.mode("overwrite").parquet(staging)
    # no commit -> nothing visible, resume processes everything
    assert table.read(spark) is None
    stats = job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out)
    assert stats["docs_in"] == len(corpus)


def test_resume_matches_oracle_totals(spark, tmp_path):
    corpus = synth.gen_corpus(60)
    out = str(tmp_path / "totals")
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus[:20]), out)
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out)
    exp = oracle.expected_lineage_totals(corpus)
    final = _final_table(spark, out)
    assert len(final) == exp["docs_out"]


def test_media_store(spark, tmp_path):
    """S10 analog: every distinct media_ref materialized once as a
    binary payload row; spans keep only the ref."""
    corpus = synth.gen_corpus(30)
    docs = job.docs_df_from_corpus(spark, corpus)
    out = str(tmp_path / "media")
    n = job.write_media_store(spark, docs, out)
    expected_refs = {s["media_ref"] for _, spans in corpus for s in spans
                     if s["media_ref"]}
    assert n == len(expected_refs)
    from local_pdftodocx_ocr_spark import kernels
    rows = spark.read.parquet(out).collect()
    for r in rows:
        assert bytes(r["payload"]).decode("utf-8") == kernels.recognize_one(r["media_ref"])


def test_manual_regions_broadcast_join(spark):
    """§3.2 analog: manual regions injected via broadcast side-table
    must extract identically to oracle-side injection."""
    from local_pdftodocx_ocr_spark import kernels
    corpus = synth.gen_corpus(12)
    docs = job.docs_df_from_corpus(spark, corpus)
    regions = spark.createDataFrame(
        [("doc-000001", "text", "manual region alpha content", "", 0, 350.0, 44.0),
         ("doc-000002", "figure", "", kernels.encode_media("manual-fig"), 0, 700.0, 60.0)],
        "doc_id string, kind string, text string, media_ref string, "
        "page int, y double, x double")
    injected = job.inject_manual_regions(docs, regions)
    unified = job.extract_spans(injected, num_partitions=3)
    got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]]
           for r in job.split_unified(unified)[0].collect()}

    # oracle-side injection: same spans appended sequentially
    extra = {
        "doc-000001": [{"kind": "text",
                        "text": "p=0;y=350.0;x=44.0|manual region alpha content",
                        "media_ref": "", "offset": 1_000_001}],
        "doc-000002": [{"kind": "figure", "text": "p=0;y=700.0;x=60.0|",
                        "media_ref": kernels.encode_media("manual-fig"),
                        "offset": 1_000_001}],
    }
    for doc_id, spans in corpus:
        expected = kernels.extract_document(doc_id, list(spans) + extra.get(doc_id, []))
        if expected:
            assert got[doc_id] == expected, doc_id
    assert any("manual region alpha" in t for (_, t, _, _) in got["doc-000001"])


def test_streaming_incremental_extraction(spark, tmp_path):
    """Continuous-ingest form of the batch contract: micro-batches via
    foreachBatch produce the identical final table as one batch run,
    and re-draining the stream adds nothing (exactly-once per doc)."""
    from local_pdftodocx_ocr_spark.streaming import extract_stream as es

    corpus = synth.gen_corpus(40)
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    # two arrival files
    job.docs_df_from_corpus(spark, corpus[:20]).coalesce(1) \
        .write.parquet(str(in_dir / "arrival=0"))
    job.docs_df_from_corpus(spark, corpus[20:]).coalesce(1) \
        .write.parquet(str(in_dir / "arrival=1"))

    out = str(tmp_path / "stream_out")
    stats = es.run_streaming_extraction(
        spark, str(in_dir) + "/*", out, str(tmp_path / "ckpt"), num_partitions=4)
    assert stats["docs_in"] == 40

    batch_out = str(tmp_path / "batch_out")
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus), batch_out,
                num_partitions=4)
    assert _final_table(spark, out) == _final_table(spark, batch_out)

    # second drain with a fresh checkpoint: snapshot resume dedupes all
    stats2 = es.run_streaming_extraction(
        spark, str(in_dir) + "/*", out, str(tmp_path / "ckpt2"), num_partitions=4)
    assert _final_table(spark, out) == _final_table(spark, batch_out)


def test_cli_stream_mode_equals_batch(spark, tmp_path, capsys):
    """--stream drains an arrivals directory through per-micro-batch
    extraction via the CLI and lands the identical final table as one
    batch run."""
    import json as _json

    from local_pdftodocx_ocr_spark.__main__ import main

    corpus = synth.gen_corpus(24)
    in_dir = tmp_path / "cli_stream_in"
    in_dir.mkdir()
    job.docs_df_from_corpus(spark, corpus[:12]).coalesce(1) \
        .write.parquet(str(in_dir / "arrival=0"))
    job.docs_df_from_corpus(spark, corpus[12:]).coalesce(1) \
        .write.parquet(str(in_dir / "arrival=1"))

    out = str(tmp_path / "cli_stream_out")
    rc = main(["--input", str(in_dir) + "/*", "--output", out,
               "--stream", "--checkpoint", str(tmp_path / "cli_ckpt"),
               "--partitions", "2"])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] == 24

    batch_out = str(tmp_path / "cli_batch_out")
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus), batch_out,
                num_partitions=2)
    assert _final_table(spark, out) == _final_table(spark, batch_out)

    # stats are PER-DRAIN, not table-lifetime: a second drain over the
    # same arrivals (fresh checkpoint) must report 0 ingested, even
    # though the table already holds 24 docs from the first drain
    rc = main(["--input", str(in_dir) + "/*", "--output", out,
               "--stream", "--checkpoint", str(tmp_path / "cli_ckpt2"),
               "--partitions", "2"])
    assert rc == 0
    stats2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["docs_in"] == 0

    # --no-resume contradicts the exactly-once streaming contract
    rc = main(["--input", str(in_dir) + "/*", "--output", out,
               "--stream", "--checkpoint", str(tmp_path / "cli_ckpt3"),
               "--no-resume"])
    assert rc == 2
    capsys.readouterr()

    # --format contradicts the parquet-only stream reader: reject with
    # the CLI's loud JSON error, not an opaque parquet failure later
    rc = main(["--input", str(in_dir) + "/*", "--output", out,
               "--stream", "--checkpoint", str(tmp_path / "cli_ckpt4"),
               "--format", "jsonl"])
    assert rc == 2
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "--format" in err["error"] and "parquet" in err["error"]


def test_cli_curate_writes_training_corpus(spark, tmp_path, capsys):
    """--curate materializes the render -> gate -> dedup -> split
    composition over the committed extraction, identical to the library
    path (pipeline_training_corpus minus the text column)."""
    import json as _json

    from local_pdftodocx_ocr_spark.__main__ import main
    from local_pdftodocx_ocr_spark.operators.extraction import curate_spans

    corpus = synth.gen_corpus(30)
    in_path = str(tmp_path / "cur_in.parquet")
    job.docs_df_from_corpus(spark, corpus).write.parquet(in_path)
    out = str(tmp_path / "cur_out")
    dest = str(tmp_path / "curated")
    rc = main(["--input", in_path, "--output", out,
               "--partitions", "2", "--curate", dest])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["curated_docs"] > 0

    got = {(r["doc_id"], r["text"], r["n_tokens"], r["split"])
           for r in spark.read.parquet(dest).collect()}
    lib = {(r["doc_id"], r["text"], r["n_tokens"], r["split"])
           for r in curate_spans(job.read_extracted(spark, out)).collect()}
    assert got == lib and len(got) == stats["curated_docs"]
    splits = {s for _, _, _, s in got}
    assert splits <= {"train", "valid", "test"} and "train" in splits


def test_cli_curate_pii_scrubs_corpus(spark, tmp_path, capsys):
    """--curate --pii: the curated corpus text is redacted with the
    typed placeholder tokens and carries an n_pii count; --pii without
    --curate is rejected loudly."""
    import json as _json

    from local_pdftodocx_ocr_spark.__main__ import main

    corpus = synth.gen_corpus(20)
    # plant PII in one doc's span stream (valid pos-header text span)
    doc_id, spans = corpus[1]
    spans = list(spans) + [{
        "kind": "text",
        "text": "p=0;y=900.0;x=40.0|contact bob@example.com or 212-555-1234 "
                "from 10.0.0.7 today",
        "media_ref": "", "offset": 999,
    }]
    corpus[1] = (doc_id, spans)
    in_path = str(tmp_path / "pii_in.parquet")
    job.docs_df_from_corpus(spark, corpus).write.parquet(in_path)
    out = str(tmp_path / "pii_out")
    dest = str(tmp_path / "pii_curated")
    rc = main(["--input", in_path, "--output", out,
               "--partitions", "2", "--curate", dest, "--pii"])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["curated_docs"] > 0
    rows = {r["doc_id"]: r for r in spark.read.parquet(dest).collect()}
    assert "n_pii" in next(iter(rows.values())).asDict()
    hit = [r for r in rows.values() if r["n_pii"] > 0]
    assert len(hit) == 1 and hit[0]["n_pii"] == 3
    assert "<EMAIL>" in hit[0]["text"] and "<PHONE>" in hit[0]["text"] \
        and "<IP>" in hit[0]["text"]
    assert "bob@example.com" not in hit[0]["text"]
    for r in rows.values():
        assert "@" not in r["text"]

    # --pii without --curate: loud rejection
    rc = main(["--input", in_path, "--output", out, "--pii"])
    assert rc == 2
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "--curate" in err["error"]


def test_cli_curate_jsonl_export(spark, tmp_path, capsys):
    """--curate-format jsonl: one JSON object per line (the standard
    LLM-training delivery format), row-identical to the parquet path;
    rejected without --curate."""
    import glob
    import json as _json

    from local_pdftodocx_ocr_spark.__main__ import main

    corpus = synth.gen_corpus(20)
    in_path = str(tmp_path / "jl_in.parquet")
    job.docs_df_from_corpus(spark, corpus).write.parquet(in_path)
    out = str(tmp_path / "jl_out")
    dest_p = str(tmp_path / "jl_curated_parquet")
    dest_j = str(tmp_path / "jl_curated_jsonl")
    assert main(["--input", in_path, "--output", out,
                 "--partitions", "2", "--curate", dest_p]) == 0
    assert main(["--input", in_path, "--output", out,
                 "--partitions", "2", "--curate", dest_j,
                 "--curate-format", "jsonl"]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["curate_format"] == "jsonl"
    rows_j = []
    for f in glob.glob(f"{dest_j}/part-*"):
        with open(f, encoding="utf-8") as fh:
            rows_j += [_json.loads(ln) for ln in fh if ln.strip()]
    got = {(r["doc_id"], r["text"], r["n_tokens"], r["split"])
           for r in rows_j}
    exp = {(r["doc_id"], r["text"], r["n_tokens"], r["split"])
           for r in spark.read.parquet(dest_p).collect()}
    assert got == exp and got

    rc = main(["--input", in_path, "--output", out,
               "--curate-format", "jsonl"])
    assert rc == 2
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "--curate" in err["error"]


def test_snapshot_time_travel(spark, tmp_path):
    """read_at(snapshot_id) returns the table AS OF that commit —
    Iceberg VERSION AS OF semantics on the parquet-manifest fallback."""
    import pytest

    from local_pdftodocx_ocr_spark.catalog import SnapshotTable

    corpus = synth.gen_corpus(30)
    out = str(tmp_path / "tt")
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus[:10]), out)
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out)
    table = SnapshotTable(out)
    first, second = [s["id"] for s in table.snapshots()]
    n_docs = lambda df: df.filter(df.row_type == "doc").count()
    at_first = n_docs(table.read_at(spark, first))
    at_second = n_docs(table.read_at(spark, second))
    assert at_first < at_second
    assert at_second == n_docs(table.read(spark))
    with pytest.raises(KeyError):
        table.read_at(spark, "snap-bogus")


def test_snapshot_compaction(spark, tmp_path):
    """compact() folds all snapshots into one with identical content;
    resume stays a no-op afterwards."""
    from local_pdftodocx_ocr_spark.catalog import SnapshotTable

    corpus = synth.gen_corpus(50)
    out = str(tmp_path / "compact")
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus[:25]), out)
    job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out)
    before = _final_table(spark, out)
    table = SnapshotTable(out)
    assert len(table.snapshots()) == 2
    table.compact(spark)
    assert len(table.snapshots()) == 1
    assert _final_table(spark, out) == before
    stats = job.run_job(spark, job.docs_df_from_corpus(spark, corpus), out)
    assert stats["docs_in"] == 0


def test_corpus_input_formats_agree(spark, tmp_path):
    """The same flat corpus fed as parquet, jsonl, and csv must produce
    the identical extraction checksum — format is an ingest concern,
    never a semantics one. Schemas are declared (no inference scan)."""
    from local_pdftodocx_ocr_spark.sources.tables import read_corpus_input

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
                .select("doc_id", "text").limit(59)
    # one doc with an embedded newline: standard CSV quotes it, and
    # only multiLine=True parses it back as ONE record
    extra = spark.createDataFrame(
        [(990001, "first line of the document\nsecond line stays attached")],
        "doc_id long, text string")
    flat = base.unionByName(extra)
    pq = str(tmp_path / "docs_pq")
    js = str(tmp_path / "docs.jsonl")
    cs = str(tmp_path / "docs.csv")
    flat.coalesce(1).write.parquet(pq)
    flat.coalesce(1).write.json(js)
    (flat.coalesce(1).write.option("header", True).option("escape", '"')
     .csv(cs))

    checks = {}
    for fmt, path in (("parquet", pq), ("jsonl", js), ("csv", cs)):
        df = read_corpus_input(spark, path)          # extension-sniffed
        assert df.schema.simpleString() == \
            "struct<doc_id:bigint,text:string>", fmt
        out = str(tmp_path / f"out_{fmt}")
        stats = job.run_job(spark, job.interleaved_docs_from_flat(df), out,
                            num_partitions=3)
        checks[fmt] = (stats["docs_in"], stats["docs_out"], stats["checksum"])
    assert checks["jsonl"] == checks["parquet"]
    assert checks["csv"] == checks["parquet"]
    assert checks["parquet"][0] == 60


def test_cli_stats_matches_library_sketches(spark, capsys):
    """--stats prints the bounded-state corpus statistics (HLL distinct
    shingles + histogram length quantiles) equal to the library query
    results on the same corpus; it is the one mode that runs without
    --output, and --output stays required everywhere else."""
    import json as _json

    from local_pdftodocx_ocr_spark.__main__ import main
    from local_pdftodocx_ocr_spark.operators import textstats

    sf = "/root/testdata/sf0.001"
    rc = main(["--input", f"{sf}/documents.parquet", "--stats"])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hll = textstats.hll_distinct_shingles(spark, sf).collect()[0]
    assert stats["est_distinct_shingles"] == hll["est_distinct_shingles"]
    assert stats["n_zero_registers"] == hll["n_zero_registers"]
    quant = {f"p{r['pct']}": r["est_chars_ub"]
             for r in textstats.length_quantile_sketch(spark, sf).collect()}
    assert stats["length_quantiles_ub"] == quant
    assert stats["n_docs"] == 500
    by_src = {r["source"]: r["est_distinct_shingles"]
              for r in textstats.hll_by_source(spark, sf).collect()}
    assert stats["sources"] == by_src

    rc = main(["--input", f"{sf}/documents.parquet"])   # no --output, no --stats
    assert rc == 2
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "--output" in err["error"]


def test_cli_compact_preserves_resume(spark, tmp_path, capsys):
    """--compact folds snapshots and a subsequent resume run still sees
    every committed doc (north-rule snapshot semantics via the CLI)."""
    import json as _json

    from local_pdftodocx_ocr_spark.__main__ import main
    from local_pdftodocx_ocr_spark.catalog import SnapshotTable

    out = str(tmp_path / "t")
    corpus = synth.gen_corpus(12)
    half = job.docs_df_from_corpus(spark, corpus[:6])
    rest = job.docs_df_from_corpus(spark, corpus)
    job.run_job(spark, half, out, num_partitions=2)
    job.run_job(spark, rest, out, num_partitions=2)      # resumes: 6 new
    assert len(SnapshotTable(out).snapshots()) == 2

    rc = main(["--input", "unused", "--output", out, "--compact"])
    assert rc == 0
    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["snapshots_before"] == 2 and line["snapshots_after"] == 1

    stats = job.run_job(spark, rest, out, num_partitions=2)
    assert stats["docs_in"] == 0        # everything still committed


def test_cli_detections_flag_changes_output(spark, tmp_path, capsys):
    """--detections merges the side table through the same kernels the
    library path uses: CLI output with detections == library
    inject_external_detections output, and differs from the no-flag run."""
    import json as _json

    from local_pdftodocx_ocr_spark.__main__ import main

    corpus, dets = synth.gen_detections_corpus()
    docs = job.docs_df_from_corpus(spark, corpus)
    in_path = str(tmp_path / "docs_in.parquet")
    docs.write.parquet(in_path)
    dets_path = str(tmp_path / "dets.parquet")
    spark.createDataFrame(
        dets, "doc_id string, page int, x double, y double, w double, "
              "h double, cls string, conf double, media_ref string") \
        .write.parquet(dets_path)

    out_plain = str(tmp_path / "out_plain")
    rc = main(["--input", in_path, "--output", out_plain, "--partitions", "2"])
    assert rc == 0
    plain = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out_det = str(tmp_path / "out_det")
    rc = main(["--input", in_path, "--output", out_det,
               "--partitions", "2", "--detections", dets_path])
    assert rc == 0
    with_det = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert with_det["docs_in"] == plain["docs_in"]
    assert with_det["checksum"] != plain["checksum"]

    # CLI path == library path, span for span
    lib = job.extract_spans(
        job.inject_external_detections(docs, spark.read.parquet(dets_path)),
        num_partitions=2)
    lib_spans = {r["doc_id"]: [tuple(s) for s in r["spans"]]
                 for r in job.split_unified(lib)[0].collect()}
    cli_spans = {r["doc_id"]: [tuple(s) for s in r["spans"]]
                 for r in job.read_extracted(spark, out_det).collect()}
    assert cli_spans == lib_spans
