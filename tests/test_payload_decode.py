"""Wire-format decode matrix — mirrors /root/reference/src/extractors.rs:764-1091."""

from __future__ import annotations

import base64
import gzip
import json
import zlib

import pytest

from hogflare_spark.sources.payload import (
    decode_content_encoding,
    decode_data_string,
    parse_batch_body,
    parse_payload,
)


def b64(obj) -> str:
    return base64.b64encode(json.dumps(obj).encode()).decode()


def test_parses_json_payload():
    body = json.dumps({"event": "test", "distinct_id": "abc", "api_key": "phc_123"})
    items = parse_payload(body.encode(), "application/json")
    assert items == [{"event": "test", "distinct_id": "abc", "api_key": "phc_123"}]


def test_parses_json_array_payload():
    body = json.dumps([{"event": "a"}, {"event": "b"}])
    assert [i["event"] for i in parse_payload(body.encode())] == ["a", "b"]


def test_parses_form_encoded_payload():
    event = {"event": "form-test", "distinct_id": "user"}
    body = f"data={b64(event)}&api_key=phc_form"
    items = parse_payload(body.encode(), "application/x-www-form-urlencoded")
    assert items == [{"event": "form-test", "distinct_id": "user", "api_key": "phc_form"}]


def test_form_detected_by_body_prefix_without_content_type():
    event = {"event": "form-test", "distinct_id": "user"}
    items = parse_payload(f"data={b64(event)}".encode())
    assert items[0]["event"] == "form-test"


def test_parses_gzipped_body():
    body = json.dumps({"event": "gzip-test", "distinct_id": "123"}).encode()
    items = parse_payload(gzip.compress(body), "application/json", "gzip")
    assert items == [{"event": "gzip-test", "distinct_id": "123"}]


def test_parses_zlib_body():
    body = json.dumps({"event": "zlib-test", "distinct_id": "z"}).encode()
    assert decode_content_encoding(zlib.compress(body), "deflate") == body


def test_parses_json_data_envelope_object():
    body = json.dumps(
        {"data": {"event": "wrapped", "distinct_id": "abc"}, "api_key": "phc_wrapped"}
    )
    items = parse_payload(body.encode())
    assert items == [
        {"event": "wrapped", "distinct_id": "abc", "api_key": "phc_wrapped"}
    ]


def test_parses_json_data_envelope_base64_array():
    body = json.dumps({"data": b64([{"event": "x"}, {"event": "y"}]), "api_key": "k"})
    items = parse_payload(body.encode())
    assert [i["event"] for i in items] == ["x", "y"]
    assert all(i["api_key"] == "k" for i in items)


def test_item_fields_win_over_shared():
    body = json.dumps(
        {"data": {"event": "x", "api_key": "item-key"}, "api_key": "envelope-key"}
    )
    assert parse_payload(body.encode())[0]["api_key"] == "item-key"


def test_gzip_js_is_zlib():
    payload = {"event": "compressed"}
    data = base64.b64encode(zlib.compress(json.dumps(payload).encode())).decode()
    assert decode_data_string(data, "gzip-js") == payload
    assert decode_data_string(data, "zlib") == payload
    assert decode_data_string(data, "deflate") == payload


def test_declared_gzip_uses_gzip():
    payload = {"event": "gz"}
    data = base64.b64encode(gzip.compress(json.dumps(payload).encode())).decode()
    assert decode_data_string(data, "gzip") == payload


def test_unsupported_compression_rejected():
    with pytest.raises(ValueError):
        decode_data_string(b64({"a": 1}), "br")


def test_undeclared_compression_sniffing_zlib_then_gzip():
    payload = {"event": "sniffed"}
    for compressor in (zlib.compress, gzip.compress):
        data = base64.b64encode(compressor(json.dumps(payload).encode())).decode()
        assert decode_data_string(data, None) == payload


def test_data_string_scalar_rejected():
    with pytest.raises(ValueError):
        decode_data_string(base64.b64encode(b'"just a string"').decode(), None)


def test_compression_method_alias():
    payload = {"event": "cm"}
    data = base64.b64encode(zlib.compress(json.dumps(payload).encode())).decode()
    body = json.dumps({"data": data, "compression_method": "gzip-js"})
    assert parse_payload(body.encode())[0]["event"] == "cm"


# ---------------------------------------------------------------------------
# batch envelope
# ---------------------------------------------------------------------------


def test_batch_plain():
    body = json.dumps(
        {"api_key": "phc_b", "batch": [{"event": "a"}, {"event": "b"}], "sent_at": "2024-01-01T00:00:00Z"}
    )
    items, env = parse_batch_body(body.encode())
    assert [i["event"] for i in items] == ["a", "b"]
    assert env["api_key"] == "phc_b"
    assert env["sent_at"] == "2024-01-01T00:00:00Z"


def test_batch_requires_array_without_data():
    body = json.dumps({"api_key": "k", "batch": {"event": "solo"}})
    with pytest.raises(ValueError):
        parse_batch_body(body.encode())


def test_batch_via_data_envelope_normalizes_single_object():
    inner = {"api_key": "inner-key", "batch": {"event": "solo"}}
    body = json.dumps({"data": b64(inner)})
    items, env = parse_batch_body(body.encode())
    assert [i["event"] for i in items] == ["solo"]
    assert env["api_key"] == "inner-key"


def test_batch_via_data_array():
    body = json.dumps({"data": b64([{"event": "a"}]), "api_key": "outer"})
    items, env = parse_batch_body(body.encode())
    assert [i["event"] for i in items] == ["a"]
    assert env["api_key"] == "outer"


def test_batch_data_object_without_batch_key_is_single_item():
    body = json.dumps({"data": b64({"event": "only", "distinct_id": "d"})})
    items, _ = parse_batch_body(body.encode())
    assert items == [{"event": "only", "distinct_id": "d"}]


def test_batch_form_encoded():
    inner = {"batch": [{"event": "fb"}]}
    body = f"data={b64(inner)}&api_key=phc_form_batch"
    items, env = parse_batch_body(body.encode(), "application/x-www-form-urlencoded")
    assert [i["event"] for i in items] == ["fb"]
    assert env["api_key"] == "phc_form_batch"


def test_batch_compressed_data():
    inner = {"batch": [{"event": "cz"}]}
    data = base64.b64encode(zlib.compress(json.dumps(inner).encode())).decode()
    body = json.dumps({"data": data, "compression": "gzip-js"})
    items, _ = parse_batch_body(body.encode())
    assert [i["event"] for i in items] == ["cz"]
