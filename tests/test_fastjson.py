"""fastjson.loads must accept exactly what the stdlib accepts: orjson is
stricter on NaN/Infinity literals and >64-bit integers, so those fall
back — the replay kernels' accepted-input set must not shrink."""

import json
import math

from hogflare_spark.functions.fastjson import loads


def test_standard_values_match_stdlib():
    for s in (
        '{"a": 1, "b": [1.5, "x", null, true]}',
        '{"nested": {"k": {"deep": [1, 2, 3]}}}',
        '"just a string"',
        "[1e308, -0.0, 2.2250738585072014e-308]",
        '{"unicode": "caf\\u00e9 \\ud83d\\ude00"}',
        '{"dup": 1, "dup": 2}',
    ):
        assert loads(s) == json.loads(s)


def test_stdlib_extensions_still_accepted():
    v = loads('{"x": NaN, "y": Infinity, "z": -Infinity}')
    assert math.isnan(v["x"]) and v["y"] == math.inf and v["z"] == -math.inf
    big = loads('{"n": 123456789012345678901234567890}')
    assert big["n"] == 123456789012345678901234567890


def test_bytes_input():
    assert loads(b'{"a": 1}') == {"a": 1}


def test_invalid_still_raises_stdlib_types():
    import pytest

    with pytest.raises(json.JSONDecodeError):
        loads("{not json")


def test_rejects_non_utf8_bytes_like_the_reference_parser():
    """A UTF-16-encoded JSON body must NOT parse (r7 ADVICE): the
    reference's capture parser is UTF-8-only, and the old
    raw.decode("utf-8") path raised UnicodeDecodeError — stdlib
    json.loads(bytes) would silently encoding-sniff it instead."""
    import json

    import pytest

    body = json.dumps({"event": "x"}).encode("utf-16")
    with pytest.raises(UnicodeDecodeError):
        loads(body)
    # sanity: the stdlib WOULD have accepted it via detect_encoding
    assert json.loads(body) == {"event": "x"}


def test_invalid_utf8_bytes_raise_unicode_error():
    import pytest

    with pytest.raises(UnicodeDecodeError):
        loads(b'{"k": "\xff\xfe\xff"}')
