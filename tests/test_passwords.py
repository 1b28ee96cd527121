from __future__ import annotations

import base64

import pytest

from dbeam_spark.passwords import read_password


def test_plaintext_wins():
    assert read_password(password="pw", password_file="/nope") == "pw"


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
