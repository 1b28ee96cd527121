"""Guards on the round-operations tooling itself: the preflight must
HARD-fail when a scale-probe replica was built from testdata that has
since been regenerated (round-5 lesson: a stale replica quietly
flattens every probe ratio)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "tools")
)


def _fake_source(dirpath) -> None:
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / "lineitem.parquet").write_bytes(b"x" * 64)
    (dirpath / "orders.parquet").write_bytes(b"y" * 32)


def test_preflight_fails_on_stale_replica(tmp_path):
    from preflight import check_probe_replicas
    from scale_probe import source_key

    base = tmp_path / "base"
    _fake_source(base)
    replica = tmp_path / "replicas" / "scale10"
    _fake_source(replica)
    (replica / "_SOURCE_KEY").write_text(source_key(str(base)))

    glob_pat = str(tmp_path / "replicas" / "scale*")
    # fresh replica: clean
    assert check_probe_replicas(glob_pat, str(base)) == 0

    # regenerate the source (content + mtime change) -> replica stale
    (base / "lineitem.parquet").write_bytes(b"z" * 128)
    os.utime(base / "lineitem.parquet")
    assert check_probe_replicas(glob_pat, str(base)) == 1

    # a replica with NO key at all is stale too
    (replica / "_SOURCE_KEY").unlink()
    assert check_probe_replicas(glob_pat, str(base)) == 1


def test_preflight_ignores_non_replica_dirs(tmp_path):
    from preflight import check_probe_replicas

    base = tmp_path / "base"
    _fake_source(base)
    # a dir matching the glob but without lineitem.parquet is not a
    # replica (e.g. an unrelated /tmp/scale-notes dir) — skipped
    (tmp_path / "replicas" / "scalejunk").mkdir(parents=True)
    glob_pat = str(tmp_path / "replicas" / "scale*")
    assert check_probe_replicas(glob_pat, str(base)) == 0
