"""prepare_data.py download path — exercised against a localhost server.

VERDICT r2 row 14 left the fetcher 'partial' because the download path had
never executed (zero-egress box). The network *stack* is still testable:
serve a dataset-shaped tarball from 127.0.0.1 and run the real
``download()`` — urlretrieve, tar extraction with the ``data`` filter,
tarball cleanup — end to end. Only the public URLs themselves remain
unverifiable offline. Parity: <ref>prepare_data.py (SURVEY.md §2).
"""
import http.server
import io
import os
import socketserver
import sys
import tarfile
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import prepare_data  # noqa: E402


def _make_corpus_tarball(root, name):
    """A <name>_data.tar.gz shaped like the reference release tarballs."""
    data_dir = os.path.join(root, f"{name}_data")
    os.makedirs(data_dir)
    for split in ("train", "valid", "test"):
        with open(os.path.join(data_dir, f"{name}.{split}.txt"), "w") as f:
            f.write("a b c d\nb c d e f\n")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        tf.add(data_dir, arcname=f"{name}_data")
    return buf.getvalue()


@pytest.fixture
def local_server(tmp_path):
    """Serve tmp_path/served/ over localhost HTTP; yield the base URL."""
    served = tmp_path / "served"
    served.mkdir()

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(served), **kw)

        def log_message(self, *a):  # keep pytest output clean
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), Handler) as httpd:
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield served, f"http://127.0.0.1:{port}"
        httpd.shutdown()


def test_download_fetches_and_extracts(tmp_path, monkeypatch, local_server):
    served, base = local_server
    (served / "yahoo_data.tar.gz").write_bytes(
        _make_corpus_tarball(str(served / "src"), "yahoo"))

    workdir = tmp_path / "work"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    rc = prepare_data.main(
        ["--dataset", "yahoo", "--url", f"{base}/yahoo_data.tar.gz"])
    assert rc == 0

    out = workdir / "datasets" / "yahoo_data"
    assert sorted(os.listdir(out)) == [
        "yahoo.test.txt", "yahoo.train.txt", "yahoo.valid.txt"]
    # the tarball itself is cleaned up after extraction
    assert not (workdir / "datasets" / "yahoo_data.tar.gz").exists()

    # the extracted corpus is loadable by the data layer
    from vae_lagging_encoder_tpu.data import MonoTextData
    data = MonoTextData(str(out / "yahoo.train.txt"))
    assert len(data.data) == 2
    assert "c" in data.vocab.word2id


def test_download_failure_reports_and_returns_1(tmp_path, monkeypatch,
                                                local_server, capsys):
    _, base = local_server  # server up, but the file is missing → 404
    monkeypatch.chdir(tmp_path)
    rc = prepare_data.main(
        ["--dataset", "yelp", "--url", f"{base}/nope.tar.gz"])
    assert rc == 1
    assert "use --offline" in capsys.readouterr().err


def test_path_traversal_member_rejected(tmp_path, monkeypatch, local_server):
    """The extraction filter must refuse tar members escaping datasets/."""
    served, base = local_server
    evil = io.BytesIO()
    with tarfile.open(fileobj=evil, mode="w:gz") as tf:
        info = tarfile.TarInfo("../evil.txt")
        payload = b"pwned"
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    (served / "synthetic_data.tar.gz").write_bytes(evil.getvalue())

    workdir = tmp_path / "work"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    rc = prepare_data.main(
        ["--dataset", "synthetic", "--url", f"{base}/synthetic_data.tar.gz"])
    assert rc == 1
    assert not (workdir / "evil.txt").exists()
    assert not (tmp_path / "evil.txt").exists()
