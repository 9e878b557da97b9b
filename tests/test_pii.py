"""Unit semantics for functions.text.redact_pii / pii_counts on hostile
fixtures (the oracle query q92 proves cross-engine parity; these pin the
edge cases the synthetic tables can't exercise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_pipeline_spark.functions.text import pii_counts, redact_pii

CASES = [
    # (raw, redacted, n_emails, n_phones, n_ips)
    ("no pii here", "no pii here", 0, 0, 0),
    ("mail a.b+c_d%e@sub.domain.co now", "mail [EMAIL] now", 1, 0, 0),
    ("call 555-123-4567 or 555-999-0000", "call [PHONE] or [PHONE]", 0, 2, 0),
    ("host 192.168.1.254 up", "host [IP] up", 0, 0, 1),
    (
        "x@y.io 111-222-3333 10.0.0.1 x@y.io",
        "[EMAIL] [PHONE] [IP] [EMAIL]",
        2,
        1,
        1,
    ),
    # email local part contains a phone-shaped digit run: the ordered
    # redaction chain masks it as one [EMAIL] (email pass runs first),
    # while the independent raw-string counters see both patterns.
    ("u123-456-7890x@ex.com", "[EMAIL]", 1, 1, 0),
    ("", "", 0, 0, 0),
]


def test_redact_and_count(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_ ) in enumerate(CASES)], ["i", "raw"]
    )
    n_e, n_p, n_i = pii_counts(F.col("raw"))
    got = {
        r["i"]: (r["red"], r["ne"], r["np"], r["ni"])
        for r in df.select(
            "i",
            redact_pii(F.col("raw")).alias("red"),
            n_e.alias("ne"),
            n_p.alias("np"),
            n_i.alias("ni"),
        ).collect()
    }
    for i, (_, red, ne, np_, ni) in enumerate(CASES):
        assert got[i] == (red, ne, np_, ni), f"case {i}: {got[i]}"
