"""Job failure types and exit-code mapping.

Mirrors reference jobs/FailedValidationException.java,
jobs/NotReadyException.java and jobs/ExceptionHandling.java — the
same exit codes, so wrappers scripted around dbeam keep working.
"""

from __future__ import annotations


class FailedValidationError(Exception):
    """Output failed a post-export validation (e.g. minRows)."""


class NotReadyError(Exception):
    """Pre-conditions for the export are not met (e.g. replication
    lag, partition too old)."""


class ExportTimeoutError(Exception):
    """Job exceeded --exportTimeout and was cancelled (the reference
    maps this through PipelineExecutionException → 47)."""


def exit_code(e: BaseException) -> int:
    """ref ExceptionHandling.exitCode: first matching class wins,
    49 otherwise."""
    codes = [
        (NotReadyError, 20),
        (IOError, 41),
        (ValueError, 43),
        (ExportTimeoutError, 47),
        (FailedValidationError, 50),
    ]
    for cls, code in codes:
        if isinstance(e, cls):
            return code
    return 49
