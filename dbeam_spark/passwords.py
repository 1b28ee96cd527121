"""Database password resolution.

Re-expresses reference options/PasswordReader.java and
options/KmsDecrypter.java: plaintext > passwordFile >
passwordFileKmsEncrypted. Cloud KMS is not reachable from this
environment, so the KMS decrypter is an injection point: pass a
`decrypt` callable (as the reference injects KmsDecrypter); the
default raises NotImplementedError.
"""

from __future__ import annotations

import base64
from collections.abc import Callable
from pathlib import Path


def _kms_unavailable(ciphertext: bytes) -> str:  # pragma: no cover - stub
    raise NotImplementedError(
        "KMS decryption requires Google Cloud KMS; inject a decrypt callable"
    )


def read_password(
    password: str | None = None,
    password_file: str | None = None,
    password_file_kms_encrypted: str | None = None,
    decrypt: Callable[[bytes], str] = _kms_unavailable,
) -> str | None:
    """Resolve the password with dbeam's precedence; None if nothing
    was configured (dbeam's --username default covers user)."""
    if password is not None:
        return password
    if password_file is not None:
        return Path(password_file).read_text().rstrip("\n")
    if password_file_kms_encrypted is not None:
        ciphertext = base64.b64decode(
            Path(password_file_kms_encrypted).read_bytes()
        )
        return decrypt(ciphertext).rstrip("\n")
    return None
