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
