"""PII scrub semantics (operators/textops.py): counts are REDACTION counts
on the progressively-scrubbed text — an IP living inside an email domain is
consumed (and counted) by the email replacement, not double-counted as an
IP. The registered contract additionally covers the sf corpus plus the
committed positive-control fixture."""

from __future__ import annotations

import hashlib

from parquet_near_storage_compute_spark.operators.textops import (
    _pii_report,
    pii_scrub,
)


def _report(spark, text):
    df = spark.createDataFrame(
        [("t", 0, text)], "corpus string, doc_id long, text string"
    )
    return _pii_report(df).collect()[0]


def test_ip_inside_email_domain_counts_as_email_only(spark):
    r = _report(spark, "mail user@1.2.3.4 and bare 5.6.7.8 end")
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 0)
    expect = hashlib.md5(b"mail <EMAIL> and bare <IP> end").hexdigest()
    assert r.scrubbed_hash == expect


def test_plain_counts_and_clean_text(spark):
    r = _report(spark, "a@b.c 10.0.0.1 call 555-1234 ok")
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
    clean = _report(spark, "no pii here at all")
    assert (clean.n_emails, clean.n_ips, clean.n_phones) == (0, 0, 0)
    assert clean.scrubbed_hash == hashlib.md5(b"no pii here at all").hexdigest()


def test_contract_covers_corpus_and_fixture(spark, sf_dir):
    rows = pii_scrub(spark, sf_dir).groupBy("corpus").count().collect()
    by = {r.corpus: r["count"] for r in rows}
    assert by["fixture"] == 200
    assert by["documents"] > 0
