"""Unit tests for the browser `/e` normalizer (P8 —
/root/reference/src/lib.rs:477-678): token→api_key precedence,
distinct_id fallback chain, $identify top-level $set/$set_once handling,
$groupidentify property extraction with 'unknown' fallbacks."""

from __future__ import annotations

import pytest

from hogflare_spark.operators.normalize import _normalize_browser


def test_token_wins_over_api_key_and_header():
    cmd = _normalize_browser(
        {"event": "ev", "distinct_id": "u", "token": "tok", "api_key": "ak"}, "hdr"
    )
    assert cmd["api_key"] == "tok"
    cmd = _normalize_browser({"event": "ev", "distinct_id": "u", "api_key": "ak"}, "hdr")
    assert cmd["api_key"] == "ak"
    cmd = _normalize_browser({"event": "ev", "distinct_id": "u"}, "hdr")
    assert cmd["api_key"] == "hdr"


def test_distinct_id_fallback_chain():
    # top-level wins
    cmd = _normalize_browser(
        {"event": "ev", "distinct_id": "top",
         "properties": {"$distinct_id": "p1", "distinct_id": "p2"}}, None
    )
    assert cmd["distinct_id"] == "top"
    # then properties.$distinct_id
    cmd = _normalize_browser(
        {"event": "ev", "properties": {"$distinct_id": "p1", "distinct_id": "p2"}}, None
    )
    assert cmd["distinct_id"] == "p1"
    # then properties.distinct_id
    cmd = _normalize_browser({"event": "ev", "properties": {"distinct_id": "p2"}}, None)
    assert cmd["distinct_id"] == "p2"
    # none -> reject
    with pytest.raises(ValueError, match="distinct_id"):
        _normalize_browser({"event": "ev", "properties": {}}, None)


def test_missing_distinct_id_rejected_before_event_branch():
    # lib.rs:528-529: the check precedes the $groupidentify branch
    with pytest.raises(ValueError, match="distinct_id"):
        _normalize_browser(
            {"event": "$groupidentify",
             "properties": {"$group_type": "t", "$group_key": "k"}}, None
        )


def test_identify_set_becomes_person_properties_set_once_goes_to_extra():
    cmd = _normalize_browser(
        {"event": "$identify", "distinct_id": "u",
         "$set": {"plan": "pro"}, "$set_once": {"first": 1}}, None
    )
    assert cmd["event"] == "$identify"
    assert cmd["person_properties_request"] == {"plan": "pro"}
    assert cmd["extra"]["$set_once"] == {"first": 1}
    upd = cmd["person_update"]
    assert upd["set"] == {"plan": "pro"} and upd["set_once"] == {"first": 1}


def test_groupidentify_extraction_and_unknown_fallbacks():
    cmd = _normalize_browser(
        {"event": "$groupidentify", "distinct_id": "u",
         "properties": {"$group_type": "company", "$group_key": "acme",
                        "$group_set": {"size": 5}}}, None
    )
    assert cmd["group_identify"] == {"group_type": "company", "group_key": "acme",
                                     "properties": {"size": 5}}
    assert cmd["distinct_id"] == "acme"  # event uses group_key
    ex = cmd["extra"]
    assert ex["group_type"] == "company" and ex["group_key"] == "acme"

    cmd = _normalize_browser(
        {"event": "$groupidentify", "distinct_id": "u", "properties": {}}, None
    )
    gi = cmd["group_identify"]
    assert gi["group_type"] == "unknown" and gi["group_key"] == "unknown"


def test_capture_groups_and_group_set_flow_through():
    cmd = _normalize_browser(
        {"event": "pageview", "distinct_id": "u",
         "properties": {"$groups": {"company": "acme"},
                        "$group_set": {"company": {"tier": "a"}},
                        "url": "/x"}}, None
    )
    assert cmd["event"] == "pageview"
    assert cmd["groups"] == {"company": "acme"}
    assert cmd["group_updates"] == [{"group_type": "company", "group_key": "acme",
                                     "properties": {"tier": "a"}}]
