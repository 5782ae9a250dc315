"""Observability & UX subsystems (L5-equivalent)."""

from .session import (
    Session,
    create_session,
    get_default_session,
    set_session_logging,
    summarize_session,
    summarize_session_table,
)
from .telemetry import (
    enable_telemetry,
    log_using,
    set_telemetry_endpoint,
    share_session_data,
)
