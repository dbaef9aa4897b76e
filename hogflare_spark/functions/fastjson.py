"""orjson-accelerated JSON parsing for the Arrow replay kernels.

`loads` is a drop-in for `json.loads` on the INPUT side of the Python
kernels (payload decode, person/group replay), where the profile shows
the stdlib parser is the single largest per-op cost (~40% of the person
replay). orjson's parser is 5-10x faster and returns identical Python
values for standard JSON; the two cases where it is STRICTER than the
stdlib — NaN/Infinity literals and integers beyond 64 bits — fall back
to `json.loads`, so accepted inputs are exactly the stdlib's.

OUTPUT stays on `json.dumps` everywhere: orjson's serializer emits raw
UTF-8 where the stdlib escapes non-ASCII, which would change the bytes
the cross-engine hash gates compare. Parsing has no such byte contract —
only the resulting values matter.

Import-guarded per the environment rules: without orjson this module is
exactly the stdlib.
"""

from __future__ import annotations

import json as _json


def _loads_utf8(s):
    """stdlib parse with the pre-orjson UTF-8-only byte contract:
    `json.loads(bytes)` auto-detects UTF-16/32 via detect_encoding, so a
    UTF-16 body the reference's UTF-8-only parser rejects would parse
    successfully through the fallback path (r7 ADVICE). Decoding
    explicitly keeps UnicodeDecodeError's old meaning at every caller."""
    if isinstance(s, (bytes, bytearray, memoryview)):
        s = bytes(s).decode("utf-8")
    return _json.loads(s)


try:
    import orjson as _orjson

    # orjson parses integers beyond 64 bits as LOSSY floats instead of
    # raising (stdlib returns the exact int) — a silent divergence no
    # exception-based fallback can catch. But the loss always SURFACES
    # as a float of magnitude >= 2^63 in the parsed result (every JSON
    # integer literal orjson can't hold exactly is that large), so a
    # value walk detects the suspect case and re-parses with the
    # stdlib. True JSON floats that big (1.2e30) also trigger the walk —
    # a harmless duplicate parse of a rare shape. A string pre-scan was
    # tried first and rejected: re.search(r"\d{19}") costs ~70% of a
    # full stdlib parse, where this walk is a few isinstance checks on
    # the typical small update.
    _BIG = float(1 << 63)

    def _has_big_float(v) -> bool:
        # iterative: recursion + generator allocation per container
        # measured away most of orjson's speed advantage
        stack = [v]
        pop = stack.pop
        extend = stack.extend
        while stack:
            v = pop()
            t = type(v)
            if t is float:
                if v >= _BIG or v <= -_BIG:
                    return True
            elif t is dict:
                extend(v.values())
            elif t is list:
                extend(v)
        return False

    def loads(s):
        try:
            out = _orjson.loads(s)
        except _orjson.JSONDecodeError:
            # stdlib accepts NaN/Infinity literals; keep accepting them
            # (via _loads_utf8 so invalid-UTF-8 bytes still raise
            # UnicodeDecodeError instead of being encoding-sniffed)
            return _loads_utf8(s)
        if _has_big_float(out):
            return _loads_utf8(s)
        return out

except ImportError:  # pragma: no cover - orjson is bundled in this env
    loads = _loads_utf8
