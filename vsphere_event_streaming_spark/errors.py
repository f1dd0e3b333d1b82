"""Typed boundary errors, mirroring memlog's error surface.

Reference: ``memlog.ErrOutOfRange`` / ``ErrFutureOffset`` mapped to
HTTP 400 at /root/reference/cmd/server/server.go:285-288 and the
stream-start check at server.go:200-203.
"""

from __future__ import annotations


class LogError(Exception):
    """Base class for event-log boundary errors."""


class OutOfRangeError(LogError):
    """Offset below the retained range (purged) — reference 'invalid offset'."""


class FutureOffsetError(LogError):
    """Offset beyond the latest written record — reference 'future offset'."""


class InvalidOffsetError(LogError):
    """Unparseable offset (non-numeric id → HTTP 400, server.go:272-276)."""
