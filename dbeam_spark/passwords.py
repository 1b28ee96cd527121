"""Database password resolution.

Re-expresses reference options/PasswordReader.java and
options/KmsDecrypter.java. Precedence matches the reference's
readPassword: passwordFileKmsEncrypted > passwordFile > plaintext.

`KmsDecrypter` implements the reference's full Cloud KMS decrypt flow
— key-name formatting (projects/{p}/locations/{l}/keyRings/{r}/
cryptoKeys/{k}), whitespace-stripped base64 ciphertext in the request
body, base64 plaintext out of the response — over a plain HTTPS POST
to the Cloud KMS v1 REST endpoint. The HTTP transport and the access
token are injectable (the reference injects HttpTransport/Credentials
the same way), so the request/response handling is fully testable
against a fake KMS endpoint without network access; the default
transport is stdlib urllib, which on a real cluster only needs an
access token (env GOOGLE_OAUTH_ACCESS_TOKEN or a token_provider —
this sandbox has no metadata server to mint one).
"""

from __future__ import annotations

import base64
import json
import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

_WS = re.compile(r"\s+")

_KMS_ENDPOINT = "https://cloudkms.googleapis.com/v1"


def _default_transport(url: str, headers: dict, body: bytes) -> bytes:
    """POST JSON over stdlib urllib; returns the response body.

    Only reached when no transport is injected — i.e. on a real
    cluster with network access to Cloud KMS."""
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers)
    with urllib.request.urlopen(req) as resp:  # pragma: no cover - net
        return resp.read()


def _env_token() -> str:
    tok = os.environ.get("GOOGLE_OAUTH_ACCESS_TOKEN")
    if not tok:
        raise RuntimeError(
            "Cloud KMS needs an access token: set "
            "GOOGLE_OAUTH_ACCESS_TOKEN or pass token_provider= "
            "(no metadata server in this environment)"
        )
    return tok


@dataclass
class KmsDecrypter:
    """Cloud KMS decrypt with the reference's defaults and semantics
    (options/KmsDecrypter.java): keyring/key/location/project come
    from KMS_KEYRING / KMS_KEY / KMS_LOCATION / KMS_PROJECT (env here,
    system properties in the reference) with the same fallbacks
    ('dbeam', 'default', 'global', required)."""

    location: str = field(
        default_factory=lambda: os.environ.get("KMS_LOCATION", "global")
    )
    keyring: str = field(
        default_factory=lambda: os.environ.get("KMS_KEYRING", "dbeam")
    )
    key: str = field(
        default_factory=lambda: os.environ.get("KMS_KEY", "default")
    )
    project: str | None = field(
        default_factory=lambda: os.environ.get("KMS_PROJECT")
    )
    # transport(url, headers, body) -> response body bytes
    transport: Callable[[str, dict, bytes], bytes] = field(
        default=_default_transport
    )
    token_provider: Callable[[], str] = field(default=_env_token)

    def key_name(self) -> str:
        if not self.project:
            raise ValueError(
                "KMS project is required (KMS_PROJECT env or project=)"
            )
        return (
            f"projects/{self.project}/locations/{self.location}"
            f"/keyRings/{self.keyring}/cryptoKeys/{self.key}"
        )

    def decrypt_binary(self, base64_ciphertext: str) -> bytes:
        """Decrypt a base64 ciphertext string to raw bytes — the
        reference's decryptBinary: whitespace is stripped from the
        ciphertext, the REST decrypt method is invoked on the key
        name, and the response's base64 plaintext is decoded."""
        body = json.dumps(
            {"ciphertext": _WS.sub("", base64_ciphertext)}
        ).encode("utf-8")
        url = f"{_KMS_ENDPOINT}/{self.key_name()}:decrypt"
        headers = {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {self.token_provider()}",
            "User-Agent": "dbeam",
        }
        resp = json.loads(self.transport(url, headers, body))
        if "plaintext" not in resp:
            raise RuntimeError(f"KMS decrypt failed: {resp}")
        return base64.b64decode(resp["plaintext"])

    def decrypt(self, base64_ciphertext: str) -> str:
        """Decrypt a base64 ciphertext string to utf-8 text."""
        return self.decrypt_binary(base64_ciphertext).decode("utf-8")

    @property
    def password_decrypt(self) -> Callable[[bytes], str]:
        """Adapter matching read_password's decrypt contract
        (ciphertext bytes -> plaintext str)."""
        return lambda ct: self.decrypt(base64.b64encode(ct).decode())


def _kms_unavailable(ciphertext: bytes) -> str:
    raise NotImplementedError(
        "KMS decryption needs credentials/network: pass "
        "decrypt=KmsDecrypter(...).password_decrypt (or any callable)"
    )


def read_password(
    password: str | None = None,
    password_file: str | None = None,
    password_file_kms_encrypted: str | None = None,
    decrypt: Callable[[bytes], str] = _kms_unavailable,
) -> str | None:
    """Resolve the password with dbeam's precedence — the KMS-encrypted
    file wins over the plaintext file, which wins over the inline
    password (reference PasswordReader.readPassword checks in exactly
    that order); None if nothing was configured (dbeam's --username
    default covers user)."""
    if password_file_kms_encrypted is not None:
        ciphertext = base64.b64decode(
            Path(password_file_kms_encrypted).read_bytes()
        )
        return decrypt(ciphertext).rstrip("\n")
    if password_file is not None:
        return Path(password_file).read_text().rstrip("\n")
    if password is not None:
        return password
    return None
