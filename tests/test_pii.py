"""PII redaction: pattern semantics, sequential-count contract, plan purity."""

from pyspark.sql import functions as F

from fhirflat_spark.operators.textops import PII_PATTERNS, redact_pii


def test_redact_pii_patterns_and_counts(spark):
    rows = [
        (1, "mail me at alice.b+dev@sub.example.org thanks"),
        (2, "server 192.168.0.1 and 10.0.0.255 are up"),
        (3, "acct 123456789 ref 999999999999 short 12345678"),
        (4, "no pii here at all"),
        (5, "bob@x.io from 8.8.8.8 acct 987654321"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}

    assert (got[1].n_email, got[1].n_ipv4, got[1].n_idnum) == (1, 0, 0)
    assert "<EMAIL>" in got[1].clean_text and "alice" not in got[1].clean_text
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_idnum) == (0, 2, 0)
    assert got[2].clean_text == "server <IP> and <IP> are up"
    # 9 and 12 digit runs redact; 8-digit run is below the floor
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_idnum) == (0, 0, 2)
    assert "12345678" in got[3].clean_text
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_idnum) == (0, 0, 0)
    assert got[4].clean_text == rows[3][1]
    assert (got[5].n_email, got[5].n_ipv4, got[5].n_idnum) == (1, 1, 1)
    assert got[5].clean_text == "<EMAIL> from <IP> acct <ID>"


def test_redact_pii_counts_are_sequential(spark):
    # an email whose local part is a 9-digit run: the email pass consumes
    # it, so the idnum count (taken AFTER the email rewrite) must be 0 —
    # counts mean "occurrences redacted by this pattern", not "in raw text"
    df = spark.createDataFrame(
        [(1, "reach 123456789@corp.example.com today")],
        "doc_id bigint, text string",
    )
    r = redact_pii(df).collect()[0]
    assert (r.n_email, r.n_ipv4, r.n_idnum) == (1, 0, 0)
    assert r.clean_text == "reach <EMAIL> today"


def test_redact_pii_tokens_never_rematch(spark):
    # replacement tokens must not contain digits or '@' (a rewrite that
    # introduced either could create a match for a later pattern)
    for _, _, token in PII_PATTERNS:
        assert "@" not in token
        assert not any(ch.isdigit() for ch in token)


def test_redact_pii_plan_pure_projection(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        redact_pii(docs)
        .select("doc_id", "n_email", F.length("clean_text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
