"""Deterministic synthetic fixtures (FIXTURES.md).

Everything is a pure function of (seed, scale): no wall-clock, no
network, no external data. The fetch *shim* consults the same
generators, so the engine's distributed fetch stage and the
sequential oracle see an identical "content server".

Outcome/memento distributions are keyed on xxhash64 of the URL so
they are stable across processes and partitionings.
"""

from __future__ import annotations

import numpy as np

from .config import EngineConfig
from .content.imagecodec import encode_fake_jpeg, encode_png, phash64
from .content.paths import xxhash64_str

TARGET_DOMAIN = "ex.com"

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega stone tree river cloud"
).split()

_TITLE_POOL = ["Shared Title", "News", "Post", "Release Notes"]


def _u(h: int) -> int:
    return h & ((1 << 64) - 1)


def gen_urls(n_urls: int, seed: int = 42) -> list[str]:
    """Deterministic URL universe on one target domain, with several
    URLs sharing the same output directory (collision pressure)."""
    rng = np.random.default_rng(seed)
    urls = [f"https://{TARGET_DOMAIN}/"]
    for i in range(n_urls - 1):
        kind = rng.integers(0, 10)
        w = _WORDS[int(rng.integers(0, len(_WORDS)))]
        if kind < 4:
            urls.append(f"https://{TARGET_DOMAIN}/blog/{w}-{i}")
        elif kind < 6:
            urls.append(f"https://{TARGET_DOMAIN}/docs/{w}/page-{i}")
        elif kind < 8:
            urls.append(f"https://{TARGET_DOMAIN}/blog/post-{i}")
        elif kind < 9:
            urls.append(f"https://{TARGET_DOMAIN}/{w}-{i}/")
        else:
            urls.append(f"https://{TARGET_DOMAIN}/news/item_{i}")
    return urls[:n_urls]


def gen_cdx_records(n_urls: int = 200, seed: int = 42, include_header: bool = True) -> list[list]:
    """Raw CDX list-of-lists [original, timestamp, mimetype] with the
    edge cases from FIXTURES.md §1: duplicate URLs with multiple
    timestamps (incl. exact ties), invalid timestamps, short records,
    optional header row. Record order is the deterministic shuffle
    that defines first-appearance crawl order (main.py:58)."""
    rng = np.random.default_rng(seed + 1)
    urls = gen_urls(n_urls, seed)
    records: list[list] = []
    for url in urls:
        n_snaps = int(rng.integers(1, 4))
        for _ in range(n_snaps):
            ts = f"202{rng.integers(0, 4)}{rng.integers(1, 13):02d}{rng.integers(1, 29):02d}{rng.integers(0, 24):02d}{rng.integers(0, 60):02d}{rng.integers(0, 60):02d}"
            records.append([url, ts, "text/html"])
        if rng.random() < 0.15 and records:
            records.append(list(records[-1]))  # exact tie duplicate
    # invalid rows
    bad_urls = rng.choice(len(urls), size=max(1, n_urls // 30), replace=False)
    for i in bad_urls:
        records.append([urls[int(i)], "20abc101000000", "text/html"])  # non-digit ts
        records.append([urls[int(i)], "2023010100", "text/html"])  # short ts
    records.append(["", "20230101000000", "text/html"])  # empty url
    records.append([urls[0]])  # short record
    order = rng.permutation(len(records))
    shuffled = [records[int(i)] for i in order]
    if include_header:
        return [["original", "timestamp", "mimetype"]] + shuffled
    return shuffled


# --- Deterministic content server -------------------------------------

def page_html(url: str) -> str:
    """Deterministic HTML for a URL covering the title / selector /
    asset / markdown lattices (FIXTURES.md §3)."""
    h = _u(xxhash64_str("page:" + url))
    title_mode = h % 10
    sel_mode = (h >> 8) % 10
    n_assets = (h >> 16) % 5
    word = _WORDS[(h >> 24) % len(_WORDS)]

    head = "<head>"
    if title_mode < 6:
        head += f"<title>Page {word} {(h >> 4) % 97}</title>"
    elif title_mode < 7:
        head += f"<title>{_TITLE_POOL[(h >> 5) % len(_TITLE_POOL)]}</title>"
    # else: no title -> h1 or URL fallback
    asset_tags = []
    for i in range(n_assets):
        ah = _u(xxhash64_str(f"asset:{url}:{i}"))
        kind = ah % 4
        if kind == 0:
            asset_tags.append(f'<script src="/static/js/app-{ah % 7}.js"></script>')
        elif kind == 1:
            asset_tags.append(f'<link rel="stylesheet" href="/static/css/site-{ah % 5}.css">')
        elif kind == 2:
            asset_tags.append(f'<img src="/media/img/pic-{ah % 9}.png" alt="pic {i}">')
        else:  # foreign / data-uri noise, filtered out by F7/F8
            asset_tags.append('<img src="https://cdn.other.com/x.png">')
            asset_tags.append('<img src="data:image/gif;base64,AA==">')
    head += "".join(t for t in asset_tags if "<link" in t or "<script" in t)
    head += "</head>"

    body_assets = "".join(t for t in asset_tags if t.startswith("<img"))
    inner = (
        f"<h2>Section {word}</h2>"
        f"<p>Paragraph about {word} with <strong>bold</strong> and "
        f'<a href="/blog/{word}">a link</a>.</p>'
        f"{body_assets}"
        f"<ul><li>item one {h % 13}</li><li>item two</li></ul>"
    )
    if title_mode >= 7 and title_mode < 8:
        inner = f"<h1>Heading {word}</h1>" + inner

    if sel_mode < 3:
        body = f'<div id="content">{inner}</div>'
    elif sel_mode < 5:
        body = f"<main>{inner}</main>"
    elif sel_mode < 6:
        body = f'<div class="main-content">{inner}</div>'
    elif sel_mode < 7:
        body = f"<article>{inner}</article>"
    elif sel_mode < 9:
        body = inner  # only 'body' selector matches
    else:
        # no-match page: content in an unselected container AND body
        # selector removed from config would make this extract_fail;
        # with default config 'body' always matches, so emulate an
        # empty-markdown page instead (whitespace-only content).
        body = "<div>   </div>"
        return f"<html>{head}<body>{body}</body></html>"
    return f"<html>{head}<body>{body}</body></html>"


def fetch_outcome(url: str, attempt: int) -> str:
    """Outcome of a wayback fetch attempt (1-based), deterministic.

    Families mirror the reference routing (wayback_client.py:82-107;
    decorators.py:116-158): ok / 404 (non-retryable) / 5xx / 429 /
    timeout (retryable) / empty / non-html (fetch 'succeeds' but
    content invalid -> None without retry)."""
    r = _u(xxhash64_str("outcome:" + url)) % 1000
    if r < 700:
        return "ok"
    if r < 740:
        return "http_404"
    if r < 790:
        return "ok" if attempt >= 2 else "http_500"
    if r < 820:
        return "ok" if attempt >= 3 else "http_429"
    if r < 850:
        return "ok" if attempt >= 2 else "timeout"
    if r < 900:
        return "http_500"  # dead: exhausts retries
    if r < 950:
        return "non_html"
    return "empty"


def memento_outcome(url: str) -> str:
    """Deterministic memento fallback result for a wayback-dead URL:
    'ok' (URI found + html fetched), 'non_html', 'loop' (web.archive.org
    URI rejected, memento_client.py:56-61), 'none' (404)."""
    r = _u(xxhash64_str("memento:" + url)) % 100
    if r < 50:
        return "ok"
    if r < 70:
        return "non_html"
    if r < 85:
        return "loop"
    return "none"


def wayback_fetch_sim(url: str, attempt: int) -> tuple[str, str | None]:
    """(outcome, html) of one attempt against the content server."""
    out = fetch_outcome(url, attempt)
    if out == "ok":
        return out, page_html(url)
    if out == "non_html":
        return out, None  # content fetched but fails '<html' validity
    return out, None


def asset_bytes(asset_url: str) -> bytes | None:
    """Deterministic asset payload; ~10% of assets 404. Image URLs
    (.png/.jpg/.jpeg) serve REAL encoded images (PNG or the
    deterministic lossy stub) so the crawl's image-decode stage runs
    against decodable payloads — the graft's corpus is image+caption
    pairs (BASELINE.json:15)."""
    h = _u(xxhash64_str("assetbytes:" + asset_url))
    if h % 10 == 0:
        return None
    low = asset_url.lower()
    if low.endswith((".png", ".jpg", ".jpeg")):
        rng = np.random.default_rng(h % (2**32))
        size = 16 + (h >> 8) % 17  # 16..32 px square
        px = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        if low.endswith(".png"):
            return bytes(encode_png(px))
        return bytes(encode_fake_jpeg(px))
    size = 64 + h % 256
    rng = np.random.default_rng(h % (2**32))
    return rng.integers(0, 256, size, dtype=np.uint8).tobytes()


def asset_image_format(asset_url: str) -> str | None:
    low = asset_url.lower()
    if low.endswith(".png"):
        return "png"
    if low.endswith((".jpg", ".jpeg")):
        return "jpeg"
    return None


# --- Image + caption corpus (BASELINE.json input_hint) -----------------

def gen_images(n: int = 64, seed: int = 42, size: int = 32) -> list[dict]:
    """Rows for the ``images`` Iceberg table:
    (image_id, bytes, w, h, fmt, caption, phash)."""
    rng = np.random.default_rng(seed + 7)
    rows = []
    for i in range(n):
        px = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        fmt = "png" if i % 2 == 0 else "jpeg"
        data = encode_png(px) if fmt == "png" else encode_fake_jpeg(px)
        word = _WORDS[i % len(_WORDS)]
        rows.append(
            {
                "image_id": f"img-{i:05d}",
                "bytes": bytes(data),
                "w": size,
                "h": size,
                "fmt": fmt,
                "caption": f"A picture of {word} number {i}",
                "phash": phash64(px),
            }
        )
    return rows


def default_config(**kw) -> EngineConfig:
    base = dict(
        target_domain=TARGET_DOMAIN,
        request_delay_seconds=1.5,
        max_retries=3,
        download_js=False,
        download_css=True,
        download_images=True,
        save_original_html=True,
        rewrite_asset_links=True,
    )
    base.update(kw)
    return EngineConfig(**base)


# Deterministic stand-in for the Memento path's datetime.now()
# timestamp (memento_client.py:30,126) — injected literal (SURVEY §3 E3).
MEMENTO_NOW_TS = "20240101000000"

# Non-archive mirror host that serves memento content in the sim.
MEMENTO_MIRROR_HOST = "memento.mirror.example.net"


def memento_api_json(url: str) -> str | None:
    """Raw Memento TimeTravel API response body for a wayback-dead
    URL — the nested-JSON shape the reference navigates
    (memento_client.py:45-61). Consistent with memento_outcome():

    - 'ok' / 'non_html': valid structure, non-archive closest URI
      (content fetch then decides);
    - 'loop': valid structure but a web.archive.org URI (the loop
      guard must reject it);
    - 'none': half the time a 404 (no body -> None), half a
      structurally-invalid body (missing 'closest') — both must
      yield no URI.
    """
    import json as _json

    m = memento_outcome(url)
    h = _u(xxhash64_str("mementojson:" + url))
    if m == "none":
        if h % 2 == 0:
            return None
        return _json.dumps({"mementos": {"first": {"uri": []}}})
    if m == "loop":
        uri = f"https://web.archive.org/web/{MEMENTO_NOW_TS}/{url}"
    else:
        uri = f"https://{MEMENTO_MIRROR_HOST}/{h % 10**8}/{url}"
    return _json.dumps(
        {
            "original_uri": url,
            "mementos": {"closest": {"datetime": MEMENTO_NOW_TS, "uri": [uri]}},
        }
    )


def memento_content_fetch(memento_uri: str) -> str | None:
    """Content served at a memento mirror URI (the SRC5 fetch). The
    original URL is embedded as the URI's path remainder."""
    parts = memento_uri.split("/", 4)
    if len(parts) < 5:
        return None
    orig = parts[4]
    m = memento_outcome(orig)
    if m == "ok":
        return page_html(orig)
    if m == "non_html":
        # fetched fine but fails the reference's '<html' validity probe
        return f"%PDF-1.4 binary-ish payload for {orig}"
    return None


def page_html_rich(url: str, n_paras: int = 40) -> str:
    """Benchmark-weight page (~30 KB): same structural lattice as
    page_html but realistically sized — real crawled pages are tens of
    KB, and extract throughput at 100 TB is bounded by DOM work per
    byte, so the scaling protocol must measure pages of that weight."""
    h = _u(xxhash64_str("rich:" + url))
    word = _WORDS[h % len(_WORDS)]
    paras = []
    for i in range(n_paras):
        w1 = _WORDS[(h >> (i % 40)) % len(_WORDS)]
        w2 = _WORDS[(h >> ((i + 7) % 40)) % len(_WORDS)]
        paras.append(
            f"<p>Paragraph {i} about {w1} and {w2} with <strong>bold {w1}</strong>, "
            f'<em>emphasis</em>, a <a href="/{w1}/{i}">link to {w2}</a> and inline '
            f"filler text that pads the document out to a realistic size for "
            f"benchmark purposes, covering {w1} {w2} topics at length.</p>"
            f"<ul><li>{w1} item {i}</li><li>{w2} item {i + 1}</li></ul>"
            f'<img src="/media/img/fig-{(h >> (i % 32)) % 50}.png" alt="figure {i} of {w1}">'
        )
    return (
        f"<html><head><title>Rich page {word} {h % 997}</title></head>"
        f'<body><div id="content"><h1>Main {word}</h1>{"".join(paras)}</div></body></html>'
    )


def gen_cdx_multihost(n_urls: int, n_hosts: int = 50, seed: int = 42, zipf: float = 1.3) -> list[list]:
    """Throughput/scaling fixture: CDX rows spread over a zipf-skewed
    host distribution (hot hosts >> tail — exercises salting + the
    per-host politeness budget across many hosts). One snapshot per
    URL; no invalid rows (throughput, not validation, is the point)."""
    rng = np.random.default_rng(seed + 3)
    weights = 1.0 / np.arange(1, n_hosts + 1) ** zipf
    weights /= weights.sum()
    hosts = rng.choice(n_hosts, size=n_urls, p=weights)
    records = []
    for i in range(n_urls):
        url = f"https://host{hosts[i]:03d}.example.org/p/{_WORDS[i % len(_WORDS)]}-{i}"
        ts = f"2023{1 + i % 12:02d}{1 + i % 28:02d}{i % 24:02d}{i % 60:02d}{i % 60:02d}"
        records.append([url, ts, "text/html"])
    return records
