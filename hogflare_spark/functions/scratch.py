"""Ephemeral scratch directories for gate-internal streaming replays.

The streaming/lake gates stage micro-batch landing files, stream
checkpoints, state-store deltas and sink files in a tempdir they create
and destroy INSIDE one query invocation. That state is ephemeral by
construction (the gate semantics replay a stream and read back the
result; nothing survives the call), so it belongs on the fastest
ephemeral filesystem available: `tempfile.mkdtemp()` defaults to /tmp,
which on these boxes is plain disk (ext4), and every offset-log fsync,
state commit and staging write pays disk latency — measured as a large
share of the ~0.45 s/micro-batch commit-protocol floor (guide §6 I/O
placement; OPTIMIZATION_r12 §1). A RAM-backed tmpfs (/dev/shm) removes
that without touching the commit protocol itself.

Durable production checkpoints belong on durable storage — this helper
is ONLY for scratch whose lifetime is one operator/query invocation,
which is exactly what the gates' `shutil.rmtree` blocks already assert.
"""

from __future__ import annotations

import os
import tempfile

_FAST_BASE: str | None | bool = False  # False = undecided


def _fast_base() -> str | None:
    global _FAST_BASE
    if _FAST_BASE is False:
        base = "/dev/shm"
        try:
            probe = tempfile.mkdtemp(prefix="hf_probe_", dir=base)
            os.rmdir(probe)
            _FAST_BASE = base
        except Exception:
            _FAST_BASE = None  # tempfile default (/tmp)
    return _FAST_BASE


def scratch_dir(prefix: str) -> str:
    """mkdtemp on tmpfs when available, else the tempfile default."""
    return tempfile.mkdtemp(prefix=prefix, dir=_fast_base())
