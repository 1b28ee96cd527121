"""Job failure types.

Mirrors reference jobs/FailedValidationException.java and
jobs/NotReadyException.java.
"""

from __future__ import annotations


class FailedValidationError(Exception):
    """Output failed a post-export validation (e.g. minRows)."""


class NotReadyError(Exception):
    """Pre-conditions for the export are not met (e.g. replication
    lag, partition too old)."""
