"""Replays the reference's sqllogictest corpora through the engine.

Default: ALL THREE corpora in full (~100 s on 32 cores) — the golden
gate runs on every `pytest tests/` invocation so regressions surface
without a flag.  Set YS_SLT_FAST=1 to trim to the peg_parser corpus
plus the first 1000 lines of measures.test (~30 s) while iterating;
`tests/slt_runner.py` is the standalone CLI.

The engine's S12 warning contract (AT (ALL)-drops-filter and the
ROLLUP/CUBE correlation note) fires on specific corpus records; the
replay CAPTURES those warnings and asserts them instead of letting
them leak into the pytest summary — an expected warning that stops
firing (or an unexpected one that starts) is a test failure here, not
console noise.

Known-failing measures.test record (tracked in README):
- 1236: LAG over an unordered window reading a subquery's implicit row
  order — Spark's execution model does not preserve subquery ORDER BY
  into parent operators, so the semantics cannot be reproduced.
"""

from __future__ import annotations

import os
import warnings

import pytest

from slt_runner import run_corpus

REF = "/root/reference/test/sql"
KNOWN_FAILURES = {1236}

# every warning the corpora are EXPECTED to raise (substring match);
# anything recorded that matches none of these fails the replay
_EXPECTED_WARNING_PATTERNS = [
    "AT (ALL ...) on AGGREGATE(revenue) does not preserve",
    "AT (ALL ...) on AGGREGATE(date_warning_revenue) does not preserve",
    "AT (ALL ...) on AGGREGATE(warning_temp_revenue) does not preserve",
    "AT modifiers combined with ROLLUP/CUBE correlate",
]


def _run_captured(path, ys, **kwargs):
    """run_corpus with the S12 warnings recorded instead of emitted;
    returns (results, failures, [warning message strings])."""
    with warnings.catch_warnings(record=True) as rec:
        # the S12 contract emits UserWarning; Resource/DeprecationWarning
        # noise (py4j sockets, interpreter shutdown) is not under test
        warnings.simplefilter("ignore")
        warnings.simplefilter("always", UserWarning)
        results, failures = run_corpus(path, ys, **kwargs)
    msgs = [str(w.message) for w in rec]
    unexpected = [m for m in msgs
                  if not any(p in m for p in _EXPECTED_WARNING_PATTERNS)]
    assert not unexpected, f"unexpected warnings: {unexpected[:3]}"
    return results, failures, msgs


@pytest.fixture()
def slt_ys(spark):
    from yardstick_spark import MeasureSession

    from slt_runner import reset_catalog

    # corpora share the session-scoped SparkSession: start each one from
    # a clean catalog so fixtures/views of the previous corpus can't
    # collide (TABLE_OR_VIEW_ALREADY_EXISTS / stale-view resolution)
    reset_catalog(spark)
    return MeasureSession(spark)


def test_peg_parser_corpus(slt_ys):
    results, failures, msgs = _run_captured(
        f"{REF}/peg_parser.test", slt_ys
    )
    assert results["fail"] == 0, failures[:5]
    assert not msgs, f"peg_parser must not warn: {msgs[:3]}"


def test_measures_corpus_head(slt_ys):
    end = 1000 if os.environ.get("YS_SLT_FAST") else None
    results, failures, msgs = _run_captured(
        f"{REF}/measures.test", slt_ys, end=end,
        skip_lines=KNOWN_FAILURES,
    )
    assert results["fail"] == 0, failures[:5]
    if end is None:
        # full replay: every contract warning must have fired — a
        # warning that silently stops firing is an S12 regression
        missing = [p for p in _EXPECTED_WARNING_PATTERNS[:3]
                   if not any(p in m for m in msgs)]
        assert not missing, f"expected warnings never fired: {missing}"


@pytest.mark.skipif(
    bool(os.environ.get("YS_SLT_FAST")), reason="YS_SLT_FAST set"
)
def test_no_semantic_prefix_corpus(slt_ys):
    results, failures, msgs = _run_captured(
        f"{REF}/no_semantic_prefix.test", slt_ys
    )
    assert results["fail"] == 0, failures[:5]
    assert any("ROLLUP/CUBE correlate" in m for m in msgs), (
        "the ROLLUP/CUBE correlation warning must fire in this corpus"
    )
