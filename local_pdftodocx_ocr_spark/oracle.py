"""Sequential reference extractor (the test oracle).

Runs the exact same kernels as the distributed job (kernels.py), one
document at a time on the driver — the strict analog of the reference's
golden-fixture gates (reference: run_e2e_test.py:54-86,
tests/test_golden_demo.py:34-45), but asserting exact span-sequence
equality per FIXTURES.md §2.
"""

from __future__ import annotations

from . import kernels


def extract_corpus(docs: list[tuple[str, list[dict]]]) -> dict[str, list[tuple[str, str, str, int]]]:
    """doc list -> {doc_id: ordered (kind, text, media_ref, offset) tuples}."""
    return {doc_id: kernels.extract_document(doc_id, spans) for doc_id, spans in docs}


def expected_lineage_totals(docs: list[tuple[str, list[dict]]]) -> dict:
    """Global lineage invariants: docs_in, docs_out (non-empty outputs),
    order-insensitive global checksum — what every partitioning of the
    distributed job must reproduce (FIXTURES.md §3)."""
    extracted = extract_corpus(docs)
    out_docs = {d: s for d, s in extracted.items() if s}
    checks = [kernels.doc_checksum(d, s) for d, s in out_docs.items()]
    return {
        "docs_in": len(docs),
        "docs_out": len(out_docs),
        "checksum": kernels.combine_checksums(checks),
    }


def flat_rows(docs: list[tuple[str, list[dict]]]) -> list[tuple[str, str, str, str, int]]:
    """Exploded (doc_id, kind, text, media_ref, offset) rows in
    deterministic order — the shape fed to the DuckDB VALUES oracle."""
    rows = []
    for doc_id, spans in docs:
        for kind, text, media_ref, off in kernels.extract_document(doc_id, spans):
            rows.append((doc_id, kind, text, media_ref, off))
    rows.sort(key=lambda r: (r[0], r[4]))
    return rows
