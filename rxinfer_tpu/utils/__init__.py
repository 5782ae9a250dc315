"""Observability & UX subsystems (L5-equivalent)."""

from .session import (
    Session,
    create_session,
    get_default_session,
    set_session_logging,
    summarize_session,
)
