"""Checkpoint downloader for the released .pth table (VERDICT r3 #4).

The reference publishes its checkpoints as Google Drive links
(/root/reference/README.md:106-140). This downloader handles both plain
http(s) URLs and Drive share links (including the large-file "can't scan
for viruses" confirmation interstitial), streams to disk with a sha256
running hash, writes `<out>.sha256`, and verifies against --sha256 when
given. The build environment has no egress, so the end-to-end chain is
proven by tests/test_fetch_verify.py against a loopback HTTP server; on an
egress-capable host the same command fetches the real files.

Usage:
  python scripts/fetch_ckpt.py --url <http-url-or-drive-link-or-drive-id> \
      --out ckpt.pth [--sha256 HEX]
"""

import argparse
import hashlib
import html.parser
import http.cookiejar
import os
import re
import sys
import urllib.parse
import urllib.request

_DRIVE_ID_PATTERNS = (
    r"drive\.google\.com/file/d/([\w-]{20,})",
    r"drive\.google\.com/(?:uc|open)\?(?:[^#]*&)?id=([\w-]{20,})",
    r"drive\.usercontent\.google\.com/download\?(?:[^#]*&)?id=([\w-]{20,})",
)


# Module constant so tests can point the Drive flow at a loopback server.
_DRIVE_UC_BASE = "https://drive.google.com/uc?export=download&id="


def extract_drive_id(url: str):
    """Drive file id from any share-link form, or None for non-Drive URLs."""
    for pat in _DRIVE_ID_PATTERNS:
        m = re.search(pat, url)
        if m:
            return m.group(1)
    if re.fullmatch(r"[\w-]{20,}", url):  # bare file id
        return url
    return None


class _FormScraper(html.parser.HTMLParser):
    """Pull the download form's action URL + hidden inputs out of the Drive
    virus-scan interstitial (served for files too large to scan)."""

    def __init__(self):
        super().__init__()
        self.action = None
        self.fields = {}

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "form" and "download" in (a.get("action") or ""):
            self.action = a["action"]
        elif tag == "input" and a.get("type") == "hidden" and a.get("name"):
            self.fields[a["name"]] = a.get("value", "")


def _stream_to(resp, out_path: str, h, log=print):
    total = resp.headers.get("Content-Length")
    done = 0
    with open(out_path, "wb") as f:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
            f.write(chunk)
            done += len(chunk)
            if total and done % (64 << 20) < (1 << 20):
                log(f"  {done >> 20} / {int(total) >> 20} MiB")
    return done


def fetch(url: str, out: str, sha256: str = None, log=print) -> str:
    """Download url -> out; return the hex sha256 (raises on mismatch)."""
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(http.cookiejar.CookieJar()))
    file_id = extract_drive_id(url)
    if file_id:
        url = _DRIVE_UC_BASE + file_id
        log(f"drive file id {file_id}")
    h = hashlib.sha256()
    req = urllib.request.Request(url, headers={"User-Agent": "aum-tpu/0.1"})
    with opener.open(req) as resp:
        ctype = resp.headers.get("Content-Type", "")
        if file_id and "text/html" in ctype:
            # Interstitial page: re-submit its confirmation form.
            page = resp.read().decode("utf-8", "replace")
            scraper = _FormScraper()
            scraper.feed(page)
            if not scraper.action:
                raise RuntimeError(
                    "Drive did not offer a download form — the file may "
                    "require sign-in or the link may be dead:\n" +
                    page[:500])
            scraper.fields.setdefault("id", file_id)
            scraper.fields.setdefault("confirm", "t")
            confirm_url = (scraper.action + "?" +
                           urllib.parse.urlencode(scraper.fields))
            log(f"following virus-scan interstitial -> {scraper.action}")
            with opener.open(urllib.request.Request(
                    confirm_url, headers={"User-Agent": "aum-tpu/0.1"})
                    ) as resp2:
                if "text/html" in resp2.headers.get("Content-Type", ""):
                    raise RuntimeError("Drive returned HTML twice; giving up")
                n = _stream_to(resp2, out, h, log)
        else:
            n = _stream_to(resp, out, h, log)
    digest = h.hexdigest()
    log(f"fetched {n} bytes -> {out}\nsha256 {digest}")
    with open(out + ".sha256", "w") as f:
        f.write(f"{digest}  {os.path.basename(out)}\n")
    if sha256:
        if digest != sha256.lower():
            os.rename(out, out + ".BAD")
            raise RuntimeError(
                f"sha256 mismatch: expected {sha256}, got {digest} "
                f"(file moved to {out}.BAD)")
        log("sha256 OK")
    return digest


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--url", required=True,
                   help="http(s) URL, Drive share link, or bare Drive id")
    p.add_argument("--out", required=True)
    p.add_argument("--sha256", help="expected hex digest (recorded on first "
                                    "fetch in <out>.sha256)")
    args = p.parse_args(argv)
    try:
        fetch(args.url, args.out, args.sha256)
    except Exception as e:  # noqa: BLE001 — CLI boundary
        print(f"FETCH FAILED: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
