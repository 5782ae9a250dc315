"""Telemetry (reference: src/telemetry.jl — async usage ping + opt-in session
sharing to a Firestore REST endpoint).

This environment is zero-egress; the subsystem keeps the reference's API shape
(endpoint configuration, opt-in toggles, session serialization) but writes
JSONL locally instead of POSTing.  Production deployments can point
``set_telemetry_endpoint`` at a collector.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

_ENDPOINT: Optional[str] = None     # file path (or future collector URL)
_ENABLED = os.environ.get("LOG_USING_RXINFER_TPU", "0") == "1"


def set_telemetry_endpoint(path_or_url: Optional[str]):
    """Reference: set_telemetry_endpoint! (src/telemetry.jl)."""
    global _ENDPOINT
    _ENDPOINT = path_or_url


def enable_telemetry(enabled: bool = True):
    global _ENABLED
    _ENABLED = enabled


def log_using(event: str = "import", payload: Optional[dict] = None):
    """Reference: log_using_rxinfer — a lightweight usage ping."""
    if not _ENABLED or not _ENDPOINT:
        return
    record = {
        "id": str(uuid.uuid4()),
        "ts": time.time(),
        "event": event,
        **(payload or {}),
    }
    try:
        with open(_ENDPOINT, "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass


def share_session_data(session=None, path: Optional[str] = None):
    """Reference: share_session_data (opt-in; src/telemetry.jl:373-474)."""
    from .session import get_default_session

    s = session or get_default_session()
    if s is None:
        return None
    target = path or _ENDPOINT
    if target is None:
        raise ValueError("No telemetry endpoint configured; pass path=.")
    s.share_session_data(target)
    return target
