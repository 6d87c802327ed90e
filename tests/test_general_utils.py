"""utils/general.py helpers (reference: yolov6/utils/general.py)."""

import io
import os
import urllib.request

import pytest

from yolov6_tpu.utils import general


def test_increment_name(tmp_path):
    p = tmp_path / "exp"
    assert str(general.increment_name(str(p))) == str(p)  # free name unchanged
    p.mkdir()
    assert str(general.increment_name(str(p))) == str(p) + "1"
    f = tmp_path / "run.txt"
    f.write_text("x")
    assert str(general.increment_name(str(f))) == str(tmp_path / "run1.txt")


def test_download_ckpt_existing_file_short_circuits(tmp_path):
    p = tmp_path / "yolov6s.pt"
    p.write_bytes(b"ckpt")
    assert general.download_ckpt(str(p)) is True
    assert p.read_bytes() == b"ckpt"  # untouched


def test_download_ckpt_fetches_when_missing(tmp_path, monkeypatch):
    """Mirrors reference utils/general.py:89-101: a missing checkpoint is
    fetched from the upstream release URL and written atomically."""
    seen = {}

    class FakeResponse(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=0):
        seen["url"] = url
        return FakeResponse(b"weights-bytes")

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    dst = tmp_path / "weights" / "yolov6n.pt"
    assert general.download_ckpt(str(dst)) is True
    assert dst.read_bytes() == b"weights-bytes"
    assert seen["url"].endswith("/releases/download/0.4.0/yolov6n.pt")
    assert not os.path.exists(str(dst) + ".part")


def test_download_ckpt_no_egress_returns_false(tmp_path, monkeypatch):
    def fail_urlopen(url, timeout=0):
        raise OSError("no route to host")

    monkeypatch.setattr(urllib.request, "urlopen", fail_urlopen)
    dst = tmp_path / "yolov6m.pt"
    assert general.download_ckpt(str(dst)) is False
    assert not dst.exists() and not os.path.exists(str(dst) + ".part")
