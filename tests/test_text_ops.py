"""Golden unit tests for the Gopher-style filter, PII redaction, and
corpus top-terms operators (oracle parity is covered by oracle_diff)."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gopher_filter_verdicts(spark):
    from yardstick_spark.llm import gopher_filter

    rows = [
        # healthy doc: stopwords present, varied bigrams, enough words
        (1, "the quick brown fox jumps over the lazy dog and then "
            "it runs far away to the old mill near the river bank"),
        # repetition: one bigram dominates -> fails top_bigram_frac
        (2, "the spam ham " + "spam ham " * 20),
        # too short
        (3, "the tiny doc"),
        # no stopwords at all
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_filter(_docs(spark, rows), min_stop_hits=1).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False
    assert out[2]["top_bigram_frac"] > 0.4
    assert out[3]["keep"] is False and out[3]["n_words"] == 3
    assert out[4]["keep"] is False and out[4]["stop_hits"] == 0
    assert abs(out[1]["mean_word_len"] - (
        sum(len(w) for w in rows[0][1].split())
        / len(rows[0][1].split()))) < 1e-6


def test_pii_redact_counts_and_placeholders(spark):
    from yardstick_spark.llm import pii_redact

    rows = [
        (1, "mail me at jane.doe+x@corp.example.org thanks"),
        (2, "server 10.0.42.7 and backup 192.168.1.254 are down"),
        (3, "call +44 207 946 0958 today"),
        (4, "nothing sensitive here"),
    ]
    out = {r["doc_id"]: r.asDict()
           for r in pii_redact(_docs(spark, rows)).collect()}
    assert out[1]["n_email"] == 1 and "[EMAIL]" in out[1]["redacted"]
    assert "jane" not in out[1]["redacted"]
    assert out[2]["n_ipv4"] == 2
    assert out[2]["redacted"].count("[IPV4]") == 2
    assert out[3]["n_phone"] == 1 and "[PHONE]" in out[3]["redacted"]
    assert out[4]["redacted"] == rows[3][1]
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)


def test_top_terms_df_ordering(spark):
    from yardstick_spark.llm import top_terms

    rows = [
        (1, "apple banana cherry"),
        (2, "apple banana"),
        (3, "apple apple apple date"),  # repeats count once per doc
    ]
    got = [(r["term"], r["df"])
           for r in top_terms(_docs(spark, rows), limit=3).collect()]
    assert got == [("apple", 3), ("banana", 2), ("cherry", 1)]
