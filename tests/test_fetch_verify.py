"""Egress-proof released-checkpoint drill (VERDICT r3 #4).

The build environment has no network egress, so the fetch->port->verify->
golden chain (scripts/fetch_and_verify.sh) is proven here against a
loopback HTTP server serving a synthetic reference-layout .pth — including
the Google-Drive virus-scan interstitial flow (the released checkpoints at
/root/reference/README.md:106-140 are Drive links). On an egress-capable
host the identical commands fetch the real files; the dataset-eval leg
(step 4) is exercised by tests/test_runner.py's --ckpt .pth eval tests.
"""

import hashlib
import http.server
import os
import subprocess
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import fetch_ckpt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def http_root(tmp_path):
    """Serve tmp_path/www on a loopback port; yields (root_dir, base_url)."""
    root = tmp_path / "www"
    root.mkdir()

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield root, f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


def test_drive_id_extraction():
    fid = "1QgnyvGYxKd-q6twXf4i05jZA5xFIFs8j"
    for url in (
            f"https://drive.google.com/file/d/{fid}/view?usp=drive_link",
            f"https://drive.google.com/uc?export=download&id={fid}",
            f"https://drive.google.com/open?id={fid}",
            f"https://drive.usercontent.google.com/download?id={fid}&confirm=t",
            fid):
        assert fetch_ckpt.extract_drive_id(url) == fid, url
    assert fetch_ckpt.extract_drive_id("https://example.com/a.pth") is None


def test_fetch_plain_http_with_checksum(http_root, tmp_path):
    root, base = http_root
    payload = os.urandom(300000)
    (root / "ckpt.pth").write_bytes(payload)
    digest = hashlib.sha256(payload).hexdigest()
    out = str(tmp_path / "got.pth")
    assert fetch_ckpt.fetch(f"{base}/ckpt.pth", out, sha256=digest) == digest
    assert open(out, "rb").read() == payload
    assert digest in open(out + ".sha256").read()


def test_fetch_checksum_mismatch_quarantines(http_root, tmp_path):
    root, base = http_root
    (root / "ckpt.pth").write_bytes(b"not the advertised bytes")
    out = str(tmp_path / "got.pth")
    rc = fetch_ckpt.main(["--url", f"{base}/ckpt.pth", "--out", out,
                          "--sha256", "0" * 64])
    assert rc == 1
    assert not os.path.exists(out) and os.path.exists(out + ".BAD")


def test_fetch_drive_interstitial_flow(http_root, tmp_path, monkeypatch):
    """Drive's large-file flow: first response is an HTML confirmation form;
    the downloader must re-submit it with the hidden fields."""
    root, base = http_root
    payload = os.urandom(50000)
    (root / "download").mkdir()
    # SimpleHTTPRequestHandler serves index.html for directory GETs, and the
    # confirm query hits /download?id=...&confirm=t... which maps to the dir.
    interstitial = f"""<html><body>
      <form id="download-form" action="{base}/download/file.bin" method="get">
        <input type="hidden" name="confirm" value="t">
        <input type="hidden" name="uuid" value="abc-123">
      </form></body></html>"""
    fid = "SyntheticDriveId0000000000000"
    (root / "uc").write_bytes(b"")  # placeholder; patched base below
    (root / "interstitial.html").write_text(interstitial)
    (root / "download" / "file.bin").write_bytes(payload)

    class HtmlThenBin(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/uc"):
                body = interstitial.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            # strip the confirm query string for the file path
            self.path = self.path.split("?")[0]
            super().do_GET()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), HtmlThenBin)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        local = f"http://127.0.0.1:{srv.server_address[1]}"
        monkeypatch.setattr(fetch_ckpt, "_DRIVE_UC_BASE",
                            f"{local}/uc?export=download&id=")
        out = str(tmp_path / "drive.pth")
        digest = hashlib.sha256(payload).hexdigest()
        assert fetch_ckpt.fetch(fid, out, sha256=digest) == digest
        assert open(out, "rb").read() == payload
    finally:
        srv.shutdown()


def test_fetch_and_verify_chain(http_root, tmp_path):
    """The full shell chain against a served synthetic .pth: fetch + sha256
    -> port -> forward -> golden record -> golden re-verify. --no-ref-parity
    keeps the chunk torch-light; the ref-parity leg itself is covered by
    tests/test_ref_parity.py."""
    import torch

    from tests.test_torch_port import make_sd_dims

    root, base = http_root
    rng = np.random.default_rng(4)
    sd = make_sd_dims(rng, depth=24, d_model=192, n_patches=64, n_class=35)
    pth = root / "aum-tiny.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pth))
    digest = hashlib.sha256(pth.read_bytes()).hexdigest()
    work = tmp_path / "work"

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        ["bash", "scripts/fetch_and_verify.sh",
         "--url", f"{base}/aum-tiny.pth", "--work", str(work),
         "--sha256", digest, "--no-ref-parity",
         "--model-type", "tiny", "--aum-type", "Fo-Bi", "--n-class", "35",
         "--audio-length", "128"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "sha256 OK" in out
    assert "PARITY OK" in out
    assert "fetch_and_verify OK" in out
    assert (work / "golden_ckpt.npz").exists()
    g = np.load(work / "golden_ckpt.npz")
    assert g["logits"].shape == (2, 35) and np.isfinite(g["logits"]).all()
