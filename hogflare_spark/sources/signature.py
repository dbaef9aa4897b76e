"""HMAC signature gate (S9) — pure-JVM expressions, no Python hot path.

Behavioral parity with reference src/extractors.rs:320-399 and the 401/200
endpoint matrix in reference tests/posthog_endpoints.rs:12-63:

- no configured secret → every request passes (gate disabled);
- secret configured and neither signature header present → reject
  (MissingSignature → 401);
- ``X-POSTHOG-SIGNATURE``: ``algo=hex`` or bare hex (default algo sha256);
- ``X-HUB-SIGNATURE``: same parse, default algo sha1;
- a request is accepted iff ANY provided (algo, hex) pair matches the
  HMAC of the *raw body bytes* under the secret; unknown algos never match;
- hex comparison mirrors ``constant_time_eq_hex``: the expected digest is
  lowercase hex, the provided value is trimmed and stripped of repeated
  leading ``sha256=`` then ``sha1=`` prefixes, then compared byte-exact
  (uppercase hex therefore does NOT match, as in the reference).

Constant-time comparison is a side-channel defense for an HTTP listener;
in a batch engine the comparison happens JVM-side over columnar data and
timing side channels don't apply, so plain equality is semantically
equivalent. The HMAC itself is computed with Catalyst expressions via the
RFC 2104 construction — H((K ^ opad) || H((K ^ ipad) || m)) — with the
two xored key blocks precomputed once driver-side from the configured
secret and embedded as binary literals. Whole-stage codegen applies; at
100 TB ingest the gate adds two hash passes per row and no shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK = 64  # sha1 and sha256 share a 64-byte block size


def _key_blocks(secret: bytes, algo: str) -> tuple[bytes, bytes]:
    """(K ^ ipad, K ^ opad) for the RFC 2104 construction."""
    if len(secret) > _BLOCK:
        secret = hashlib.new(algo, secret).digest()
    key = secret.ljust(_BLOCK, b"\x00")
    return (
        bytes(b ^ 0x36 for b in key),
        bytes(b ^ 0x5C for b in key),
    )


def hmac_hex_expr(body: Column, secret: str, algo: str) -> Column:
    """Lowercase-hex HMAC-sha1/sha256 of a binary/string column, JVM-side."""
    if algo not in ("sha1", "sha256"):
        raise ValueError(f"unsupported hmac algo {algo!r}")
    k_ipad, k_opad = _key_blocks(secret.encode("utf-8"), algo)
    data = body.cast("binary")
    if algo == "sha256":
        inner = F.unhex(F.sha2(F.concat(F.lit(k_ipad), data), 256))
        return F.lower(F.sha2(F.concat(F.lit(k_opad), inner), 256))
    inner = F.unhex(F.sha1(F.concat(F.lit(k_ipad), data)))
    return F.lower(F.sha1(F.concat(F.lit(k_opad), inner)))


def _parsed(header: Column, default_algo: str) -> tuple[Column, Column]:
    """(algo, cleaned_hex) per parse_signature + constant_time_eq_hex
    (extractors.rs:362-369, 392-399)."""
    raw = F.trim(header)
    has_eq = raw.contains("=")
    algo = F.when(has_eq, F.trim(F.regexp_extract(raw, "^([^=]*)=", 1))).otherwise(
        F.lit(default_algo)
    )
    sig = F.when(has_eq, F.trim(F.regexp_replace(raw, "^[^=]*=", ""))).otherwise(raw)
    cleaned = F.regexp_replace(
        F.regexp_replace(sig, "^(sha256=)+", ""), "^(sha1=)+", ""
    )
    return algo, cleaned


def signature_ok_expr(
    body: Column,
    secret: str | None,
    sig_posthog: Column,
    sig_hub: Column,
) -> Column:
    """Boolean accept column for the signature gate.

    ``sig_posthog`` / ``sig_hub`` are the raw header values (null when the
    header is absent). With ``secret=None`` the gate is open (reference
    returns Ok immediately, extractors.rs:325-327).
    """
    if secret is None:
        return F.lit(True)

    exp256 = hmac_hex_expr(body, secret, "sha256")
    exp1 = hmac_hex_expr(body, secret, "sha1")

    def matches(header: Column, default_algo: str) -> Column:
        algo, cleaned = _parsed(header, default_algo)
        return header.isNotNull() & (
            ((algo == "sha256") & (cleaned == exp256))
            | ((algo == "sha1") & (cleaned == exp1))
        )

    any_provided = sig_posthog.isNotNull() | sig_hub.isNotNull()
    return any_provided & (
        F.coalesce(matches(sig_posthog, "sha256"), F.lit(False))
        | F.coalesce(matches(sig_hub, "sha1"), F.lit(False))
    )


def verify_signature_gate(
    raw: DataFrame,
    secret: str | None,
    body_col: str = "body",
    sig_posthog_col: str = "sig_posthog",
    sig_hub_col: str = "sig_hub",
) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejected) split of raw request rows.

    Rejected rows correspond to the reference's 401 responses — they never
    reach the pipeline; callers may land them in an errors table. Missing
    signature columns are treated as absent headers.
    """
    cols = raw.columns

    def opt(name: str) -> Column:
        return F.col(name) if name in cols else F.lit(None).cast("string")

    ok = signature_ok_expr(
        F.col(body_col), secret, opt(sig_posthog_col), opt(sig_hub_col)
    )
    ok = F.coalesce(ok, F.lit(False))
    return raw.where(ok), raw.where(~ok)
