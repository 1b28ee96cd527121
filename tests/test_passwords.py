from __future__ import annotations

import base64

import pytest

from dbeam_spark.passwords import read_password


def test_password_file_wins_over_plaintext(tmp_path):
    # reference PasswordReader checks KMS file, then file, then
    # plaintext — the file must win when both are configured
    f = tmp_path / "pw"
    f.write_text("from-file\n")
    assert (
        read_password(password="inline", password_file=str(f))
        == "from-file"
    )


def test_kms_file_wins_over_password_file(tmp_path):
    enc = tmp_path / "pw.encrypted"
    enc.write_bytes(base64.b64encode(b"cipherbytes"))
    plain = tmp_path / "pw"
    plain.write_text("from-file\n")
    got = read_password(
        password="inline",
        password_file=str(plain),
        password_file_kms_encrypted=str(enc),
        decrypt=lambda ct: "from-kms",
    )
    assert got == "from-kms"


def test_password_file(tmp_path):
    f = tmp_path / "pw"
    f.write_text("secret\n")
    assert read_password(password_file=str(f)) == "secret"


def test_kms_file_with_injected_decrypter(tmp_path):
    f = tmp_path / "pw.encrypted"
    f.write_bytes(base64.b64encode(b"cipherbytes"))
    got = read_password(
        password_file_kms_encrypted=str(f),
        decrypt=lambda ct: "plain" if ct == b"cipherbytes" else "wrong",
    )
    assert got == "plain"


def test_kms_default_unavailable(tmp_path):
    f = tmp_path / "pw.encrypted"
    f.write_bytes(base64.b64encode(b"x"))
    with pytest.raises(NotImplementedError):
        read_password(password_file_kms_encrypted=str(f))


def test_nothing_configured():
    assert read_password() is None


def _fake_kms_transport(store):
    """In-process Cloud KMS v1 decrypt endpoint: validates the URL,
    auth header, and request shape, then 'decrypts' by reversing the
    ciphertext bytes (any bijection works for the protocol test)."""
    import json as _json

    def transport(url, headers, body):
        store["url"] = url
        store["headers"] = headers
        req = _json.loads(body)
        store["request"] = req
        assert headers["Authorization"] == "Bearer tok-123"
        assert url.startswith("https://cloudkms.googleapis.com/v1/")
        assert url.endswith(":decrypt")
        ct = base64.b64decode(req["ciphertext"])
        plain = bytes(reversed(ct))
        return _json.dumps(
            {"plaintext": base64.b64encode(plain).decode()}
        ).encode()

    return transport


def test_kms_decrypter_request_response_flow():
    from dbeam_spark.passwords import KmsDecrypter

    store = {}
    kms = KmsDecrypter(
        project="proj-1",
        transport=_fake_kms_transport(store),
        token_provider=lambda: "tok-123",
    )
    # reference key-name format and defaults (dbeam/default/global)
    assert kms.key_name() == (
        "projects/proj-1/locations/global/keyRings/dbeam"
        "/cryptoKeys/default"
    )
    secret = b"s3cr3t-pw"
    ct_b64 = base64.b64encode(bytes(reversed(secret))).decode()
    # whitespace in the ciphertext is stripped before the request
    got = kms.decrypt("  " + ct_b64[:4] + "\n" + ct_b64[4:] + " ")
    assert got == "s3cr3t-pw"
    assert store["request"]["ciphertext"] == ct_b64
    assert (
        store["url"]
        == "https://cloudkms.googleapis.com/v1/" + kms.key_name()
        + ":decrypt"
    )


def test_kms_decrypter_env_defaults(monkeypatch):
    from dbeam_spark.passwords import KmsDecrypter

    monkeypatch.setenv("KMS_PROJECT", "envproj")
    monkeypatch.setenv("KMS_KEYRING", "ring2")
    monkeypatch.setenv("KMS_KEY", "key2")
    monkeypatch.setenv("KMS_LOCATION", "europe-west1")
    kms = KmsDecrypter()
    assert kms.key_name() == (
        "projects/envproj/locations/europe-west1/keyRings/ring2"
        "/cryptoKeys/key2"
    )


def test_kms_decrypter_requires_project():
    from dbeam_spark.passwords import KmsDecrypter

    with pytest.raises(ValueError):
        KmsDecrypter(project=None).key_name()


def test_kms_decrypter_error_response():
    import json as _json

    from dbeam_spark.passwords import KmsDecrypter

    kms = KmsDecrypter(
        project="p",
        transport=lambda u, h, b: _json.dumps(
            {"error": {"code": 403, "message": "denied"}}
        ).encode(),
        token_provider=lambda: "tok-123",
    )
    with pytest.raises(RuntimeError, match="denied"):
        kms.decrypt(base64.b64encode(b"x").decode())


def test_read_password_via_kms_decrypter(tmp_path):
    """The full PasswordReader path: b64 file -> KmsDecrypter ->
    plaintext, trailing newline stripped like the file path."""
    from dbeam_spark.passwords import KmsDecrypter, read_password

    store = {}
    kms = KmsDecrypter(
        project="proj-1",
        transport=_fake_kms_transport(store),
        token_provider=lambda: "tok-123",
    )
    ct = bytes(reversed(b"from-kms\n"))
    f = tmp_path / "pw.encrypted"
    f.write_bytes(base64.b64encode(ct))
    got = read_password(
        password_file_kms_encrypted=str(f),
        decrypt=kms.password_decrypt,
    )
    assert got == "from-kms"


def test_kms_token_required(monkeypatch):
    from dbeam_spark.passwords import KmsDecrypter

    monkeypatch.delenv("GOOGLE_OAUTH_ACCESS_TOKEN", raising=False)
    kms = KmsDecrypter(
        project="p", transport=lambda u, h, b: b"{}"
    )
    with pytest.raises(RuntimeError, match="access token"):
        kms.decrypt(base64.b64encode(b"x").decode())
