"""JVM fast-path decode parity: fast_capture_path vs the Python kernel.

The fast path must be *invisible*: for every body — eligible or not —
`decode_normalize_requests(fast_path=True)` and `fast_path=False` must
produce identical COMMAND_SCHEMA rows. Eligible bodies additionally prove
the JVM expressions are byte-parity twins of command_row; ineligible ones
prove the routing falls back instead of diverging.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hogflare_spark.operators.normalize import (
    decode_normalize_requests,
    fast_capture_path,
)

# (body, should_be_fast_eligible)
CORPUS = [
    # the hot shape: plain capture, no state ops
    ('{"event":"pageview","distinct_id":"u1"}', True),
    # with properties
    ('{"event":"ev","distinct_id":"u1","properties":{"k":5,"s":"x y"}}', True),
    # the person-fold gate shape: $set / $set_once / $unset
    (
        '{"event":"ev","distinct_id":"7","properties":{"$set":{"k":5,"temp":5},'
        '"$set_once":{"first_k":5}}}',
        True,
    ),
    (
        '{"event":"ev","distinct_id":"7","properties":{"$set":{"k":5},'
        '"$set_once":{"first_k":5},"$unset":["temp"]}}',
        True,
    ),
    # the group gate shape: $groups + $group_set
    (
        '{"event":"ev","distinct_id":"9","properties":{"$groups":{"segment":"WEB"},'
        '"$group_set":{"segment":{"k":41}}}}',
        True,
    ),
    # $group_set type not present in $groups → no update rows
    (
        '{"event":"ev","distinct_id":"9","properties":{"$groups":{"segment":"WEB"},'
        '"$group_set":{"org":{"k":1}}}}',
        True,
    ),
    # empty $group_set props object → skipped
    (
        '{"event":"ev","distinct_id":"9","properties":{"$groups":{"segment":"WEB"},'
        '"$group_set":{"segment":{}}}}',
        True,
    ),
    # timestamp + api_key + context object
    (
        '{"event":"ev","distinct_id":"u","timestamp":"2024-01-01T00:00:00Z",'
        '"api_key":"k1","context":{"lib":"web"}}',
        False,  # timestamp contains no digit[.eE]? "2024-..." — no dot after digit;
        # but "00:00:00Z" is fine; actually eligible — fixed below
    ),
    # unknown top-level field → extra stash → Python path
    ('{"event":"ev","distinct_id":"u","custom":1}', False),
    # non-string distinct_id → Python path (drops the row there too)
    ('{"event":"ev","distinct_id":5}', False),
    # float property → Python path (Java E-notation hazard)
    ('{"event":"ev","distinct_id":"u","properties":{"f":12345678.5}}', False),
    # exponent → Python path
    ('{"event":"ev","distinct_id":"u","properties":{"g":1e23}}', False),
    # non-ASCII → Python path (ensure_ascii escaping)
    ('{"event":"ev","distinct_id":"u","properties":{"s":"café"}}', False),
    # escape sequence → Python path
    ('{"event":"ev","distinct_id":"u","properties":{"s":"a\\"b"}}', False),
    # duplicate keys (any depth) → Python path (last-wins there)
    ('{"event":"ev","distinct_id":"u","properties":{"a":1,"a":2}}', False),
    # $unset as single string → Python path
    ('{"event":"ev","distinct_id":"u","properties":{"$set":{"a":1},"$unset":"temp"}}', False),
    # $unset as object → Python path
    (
        '{"event":"ev","distinct_id":"u","properties":{"$set":{"a":1},'
        '"$unset":{"temp":1}}}',
        False,
    ),
    # $groups with non-string value → Python path
    ('{"event":"ev","distinct_id":"u","properties":{"$groups":{"segment":5}}}', False),
    # array payload (multi-item) → Python path
    ('[{"event":"a","distinct_id":"u"},{"event":"b","distinct_id":"u"}]', False),
    # data envelope → Python path
    ('{"data":{"event":"a","distinct_id":"u"}}', False),
    # compression key → Python path
    ('{"event":"a","distinct_id":"u","compression":"gzip"}', False),
    # malformed JSON → dropped by both paths
    ('{"event":"a","distinct_id":', False),
    # non-object properties (scalar) → still normalizes; string props may
    # contain anything → Python path via props object check
    ('{"event":"a","distinct_id":"u","properties":5}', False),
]

# index 7 is actually eligible (ISO timestamp has no digit-followed-by-[.eE])
CORPUS[7] = (CORPUS[7][0], True)

# canonical-lane regression cases (the cheap regex lane added in round 3)
CORPUS += [
    # permuted top-level key order: misses the canonical lane, must still
    # be eligible via the deep variant probes
    ('{"distinct_id":"u1","event":"pageview"}', True),
    ('{"properties":{"k":1},"event":"ev","distinct_id":"u"}', True),
    # the canonical regex's one structural hole: a trailing top-level key
    # whose value makes the body end in "}}" — the exact-key-set check
    # must reject the lane and the deep lane must route it to Python
    # (unknown field => extra stash)
    ('{"event":"e","distinct_id":"u","properties":{"a":1},"custom":{}}', False),
    # braces inside string values of properties (SAFE: no quotes/escapes)
    ('{"event":"e","distinct_id":"u","properties":{"s":"a{b}c}"}}', True),
    # canonical order with strict-shape $unset + $set: admitted by the
    # lane itself (conditional special-key checks fire via contains)
    ('{"event":"e","distinct_id":"u","properties":{"$unset":["a"],"$set":{"x":1}}}', True),
]


def _raw_frame(spark, bodies):
    return spark.createDataFrame(
        [(i, "capture", b) for i, b in enumerate(bodies)],
        "request_seq long, endpoint string, body string",
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


def test_fast_slow_parity(spark):
    raw = _raw_frame(spark, [b for b, _ in CORPUS])
    fast = decode_normalize_requests(raw, fast_path=True)
    slow = decode_normalize_requests(raw, fast_path=False)
    assert _rows(fast) == _rows(slow)


def test_eligibility_matches_expectation(spark):
    raw = _raw_frame(spark, [b for b, _ in CORPUS])
    eligible, _, _ = fast_capture_path(raw)
    got = {
        r["request_seq"]: bool(r["e"])
        for r in raw.select("request_seq", F.coalesce(eligible, F.lit(False)).alias("e")).collect()
    }
    for i, (body, want) in enumerate(CORPUS):
        assert got[i] == want, f"body {i}: {body[:60]} eligible={got[i]} want={want}"


def test_fast_rows_match_python_kernel_values(spark):
    """Byte-level check on the serialized JSON columns for the gate shapes."""
    bodies = [b for b, ok in CORPUS if ok]
    raw = _raw_frame(spark, bodies)
    fast = decode_normalize_requests(raw, fast_path=True).collect()
    slow = decode_normalize_requests(raw, fast_path=False).collect()
    f = {r["request_seq"]: r for r in fast}
    s = {r["request_seq"]: r for r in slow}
    assert set(f) == set(s)
    for k in f:
        assert f[k].asDict() == s[k].asDict(), f"row {k} diverged"


def test_non_capture_endpoints_fall_back(spark):
    raw = spark.createDataFrame(
        [
            (0, "identify", '{"distinct_id":"u","properties":{"name":"n"}}'),
            (1, "groups", '{"group_type":"t","group_key":"k","properties":{"a":1}}'),
        ],
        "request_seq long, endpoint string, body string",
    )
    eligible, _, _ = fast_capture_path(raw)
    n_fast = raw.where(F.coalesce(eligible, F.lit(False))).count()
    assert n_fast == 0
    fast = decode_normalize_requests(raw, fast_path=True)
    slow = decode_normalize_requests(raw, fast_path=False)
    assert _rows(fast) == _rows(slow)


def test_fast_path_has_no_python_stage_for_all_eligible(spark):
    """All-eligible input: the fast frame alone carries every row, and its
    plan contains no Python evaluation for those rows."""
    bodies = [b for b, ok in CORPUS if ok]
    raw = _raw_frame(spark, bodies)
    eligible, build, _ = fast_capture_path(raw)
    fast_df = build(raw.where(F.coalesce(eligible, F.lit(False))))
    assert fast_df.count() == len(bodies)
    plan = fast_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
