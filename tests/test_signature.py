"""HMAC signature gate (S9) vs the Python hmac stdlib oracle.

Mirrors reference src/extractors.rs:320-399 semantics and the 401/200
matrix of reference tests/posthog_endpoints.rs:12-63.
"""

from __future__ import annotations

import hashlib
import hmac as pyhmac

from pyspark.sql import functions as F

from hogflare_spark.sources.signature import (
    hmac_hex_expr,
    verify_signature_gate,
)

SECRET = "test-signing-secret"
BODY = '{"event":"signed-event","distinct_id":"signed-user"}'


def _mac(body: str, algo: str, secret: str = SECRET) -> str:
    return pyhmac.new(secret.encode(), body.encode(), getattr(hashlib, algo)).hexdigest()


def _gate(spark, rows, secret=SECRET):
    df = spark.createDataFrame(
        rows, "request_seq long, body string, sig_posthog string, sig_hub string"
    )
    ok, rejected = verify_signature_gate(df, secret)
    return (
        {r["request_seq"] for r in ok.collect()},
        {r["request_seq"] for r in rejected.collect()},
    )


def test_hmac_expr_matches_stdlib(spark):
    """JVM RFC-2104 construction is bit-parity with python hmac, for both
    algos, across secrets shorter/longer than the 64-byte block."""
    bodies = [BODY, "", "x" * 1000, '{"a":1}']
    secrets = [SECRET, "s", "k" * 100]  # >64 bytes exercises the H(key) path
    df = spark.createDataFrame([(b,) for b in bodies], "body string")
    for secret in secrets:
        got = df.select(
            "body",
            hmac_hex_expr(F.col("body"), secret, "sha256").alias("h256"),
            hmac_hex_expr(F.col("body"), secret, "sha1").alias("h1"),
        ).collect()
        for r in got:
            assert r["h256"] == _mac(r["body"], "sha256", secret)
            assert r["h1"] == _mac(r["body"], "sha1", secret)


def test_valid_sha256_accepted_prefixed_and_bare(spark):
    sig = _mac(BODY, "sha256")
    ok, rej = _gate(
        spark,
        [
            (0, BODY, f"sha256={sig}", None),
            (1, BODY, sig, None),  # bare hex defaults to sha256
        ],
    )
    assert ok == {0, 1} and rej == set()


def test_valid_sha1_hub_header(spark):
    sig = _mac(BODY, "sha1")
    ok, rej = _gate(
        spark,
        [
            (0, BODY, None, f"sha1={sig}"),
            (1, BODY, None, sig),  # bare hex in x-hub defaults to sha1
            (2, BODY, f"sha1={sig}", None),  # explicit algo overrides header default
        ],
    )
    assert ok == {0, 1, 2} and rej == set()


def test_unsigned_rejected_when_secret_configured(spark):
    """The reference's 401: secret configured, no signature headers."""
    ok, rej = _gate(spark, [(0, BODY, None, None)])
    assert ok == set() and rej == {0}


def test_invalid_signature_rejected(spark):
    bad = "0" * 64
    ok, rej = _gate(
        spark,
        [
            (0, BODY, f"sha256={bad}", None),
            (1, BODY, None, f"sha1={'0' * 40}"),
            # valid digest of a DIFFERENT body
            (2, BODY, f"sha256={_mac('other', 'sha256')}", None),
        ],
    )
    assert ok == set() and rej == {0, 1, 2}


def test_uppercase_hex_rejected(spark):
    """constant_time_eq_hex compares bytes of lowercase expected hex."""
    ok, rej = _gate(spark, [(0, BODY, f"sha256={_mac(BODY, 'sha256').upper()}", None)])
    assert ok == set() and rej == {0}


def test_unknown_algo_never_matches(spark):
    md5 = pyhmac.new(SECRET.encode(), BODY.encode(), hashlib.md5).hexdigest()
    ok, rej = _gate(spark, [(0, BODY, f"md5={md5}", None)])
    assert ok == set() and rej == {0}


def test_any_matching_header_wins(spark):
    """verify_signature accepts if ANY provided pair matches."""
    ok, rej = _gate(
        spark,
        [
            (0, BODY, "sha256=" + "0" * 64, f"sha1={_mac(BODY, 'sha1')}"),
            (1, BODY, f"sha256={_mac(BODY, 'sha256')}", "sha1=" + "0" * 40),
        ],
    )
    assert ok == {0, 1} and rej == set()


def test_doubled_prefix_stripped(spark):
    """trim_start_matches strips repeated prefixes from the hex side."""
    sig = _mac(BODY, "sha256")
    ok, rej = _gate(spark, [(0, BODY, f"sha256=sha256={sig}", None)])
    assert ok == {0} and rej == set()


def test_no_secret_gate_open(spark):
    ok, rej = _gate(
        spark,
        [(0, BODY, None, None), (1, BODY, "sha256=" + "0" * 64, None)],
        secret=None,
    )
    assert ok == {0, 1} and rej == set()


def test_gate_plan_is_jvm_only(spark):
    df = spark.createDataFrame(
        [(0, BODY, f"sha256={_mac(BODY, 'sha256')}", None)],
        "request_seq long, body string, sig_posthog string, sig_hub string",
    )
    ok, _ = verify_signature_gate(df, SECRET)
    plan = ok._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_ingest_raw_requests_signing_gate_e2e(spark):
    """End-to-end mirror of the endpoint test: signed capture lands, the
    unsigned one 401s out of the pipeline."""
    from hogflare_spark.operators.ingest import ingest_raw_requests

    signed = '{"event":"signed-event","distinct_id":"signed-user"}'
    unsigned = '{"event":"unsigned-event","distinct_id":"other-user"}'
    raw = spark.createDataFrame(
        [
            (0, "capture", signed, f"sha256={_mac(signed, 'sha256')}", None),
            (1, "capture", unsigned, None, None),
        ],
        "request_seq long, endpoint string, body string, "
        "sig_posthog string, sig_hub string",
    )
    out = ingest_raw_requests(raw, signing_secret=SECRET)
    events = [r["event"] for r in out["events"].collect()]
    assert events == ["signed-event"]
