"""Sequential reference-semantics oracle.

Replays the reference's single-threaded crawl loop
(/root/reference/main.py:21-175) over the deterministic fixture
content server (datagen.py), producing golden outputs the distributed
engine must match exactly:

- crawl order (first-appearance order of unique URLs, main.py:58)
- URL-seen set (success-only checkpointing, main.py:161-164;
  memento_client.py:131)
- docs: (url, ts, title, dir, filename, markdown bytes incl. the
  literal-backslash-n header quirk, file_handler.py:142-144)
- assets: saved names incl. the ``-N``-strip collision quirk
  (file_handler.py:253-263)

The oracle shares only *scalar/DOM kernels* with the engine
(content/); all orchestration here is an independent sequential
re-derivation, so order/routing/retry/state bugs in the distributed
plan cannot self-confirm.
"""

from __future__ import annotations

import posixpath
import re
from dataclasses import dataclass, field

from ..config import FILENAME_COLLISION_LIMIT, EngineConfig
from ..content.extract import extract_and_convert_content, find_assets
from ..content.paths import (
    asset_base_and_ext,
    asset_type_dir,
    markdown_base_filename,
    markdown_file_bytes,
    page_dir,
)
from ..datagen import (
    MEMENTO_NOW_TS,
    asset_bytes,
    memento_outcome,
    page_html,
    wayback_fetch_sim,
)


def process_cdx_oracle(cdx_data: list[list]) -> dict[str, str]:
    """Latest-snapshot-per-URL (cdx_client.py:81-140): strict-greater
    update (first occurrence wins exact ties, :129-130), invalid
    records skipped (:108-126), insertion order = crawl order."""
    latest: dict[str, str] = {}
    for record in cdx_data:
        if not isinstance(record, list) or len(record) < 2:
            continue
        url, ts = record[0], record[1]
        if not url or not ts:
            continue
        if not (len(ts) == 14 and ts.isdigit()):
            continue
        if url not in latest or ts > latest[url]:
            latest[url] = ts
    return latest


def strip_header(cdx_data: list[list]) -> list[list]:
    """cdx_client.py:41-45."""
    if cdx_data and cdx_data[0] == ["original", "timestamp", "mimetype"]:
        return cdx_data[1:]
    return cdx_data


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)  # all processed (non-skipped) URLs in order
    seen: list[str] = field(default_factory=list)  # checkpoint adds, in order
    docs: list[dict] = field(default_factory=list)
    htmls: list[dict] = field(default_factory=list)  # SNK2 original-HTML saves
    assets: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)  # graft corpus rows
    failed: list[tuple[str, str]] = field(default_factory=list)  # (url, reason)

    @property
    def seen_set(self) -> set[str]:
        return set(self.seen)


class _FakeFS:
    """In-memory stand-in for os.path.exists-based collision probing."""

    def __init__(self) -> None:
        self.paths: set[str] = set()

    def exists(self, p: str) -> bool:
        return p in self.paths

    def touch(self, p: str) -> None:
        self.paths.add(p)


def _save_with_collisions_md(fs: _FakeFS, dirpath: str, base: str, ext: str) -> str | None:
    """file_handler.py:125-137 (.md) / :176-188 (.html): plain -N
    counter on the unchanged base name; abort past the limit."""
    filename = f"{base}{ext}"
    full = posixpath.join(dirpath, filename)
    counter = 1
    while fs.exists(full):
        filename = f"{base}-{counter}{ext}"
        full = posixpath.join(dirpath, filename)
        counter += 1
        if counter > FILENAME_COLLISION_LIMIT:
            return None
    fs.touch(full)
    return filename


def _save_with_collisions_asset(fs: _FakeFS, dirpath: str, base: str, ext: str) -> str | None:
    """file_handler.py:250-263: the counter path re-splits the current
    filename and strips a previous ``-N`` before appending."""
    filename = f"{base}{ext}"
    full = posixpath.join(dirpath, filename)
    counter = 1
    while fs.exists(full):
        b, e = posixpath.splitext(filename)
        b = re.sub(r"-\d+$", "", b)
        filename = f"{b}-{counter}{e}"
        full = posixpath.join(dirpath, filename)
        counter += 1
        if counter > FILENAME_COLLISION_LIMIT:
            return None
    fs.touch(full)
    return filename


def _fetch_with_retries(url: str, max_retries: int) -> str | None:
    """Inline retry loop per the decorator (decorators.py:85-158):
    retryable outcomes (429/5xx/timeout) retried up to max_retries;
    404/empty/non_html return None immediately."""
    retries = 0
    while True:
        attempt = retries + 1
        outcome, html = wayback_fetch_sim(url, attempt)
        if outcome == "ok":
            return html
        if outcome in ("http_404", "non_html", "empty"):
            return None
        # retryable: http_429 / http_500 / timeout
        if retries < max_retries:
            retries += 1
            continue
        return None


def run_oracle(
    cdx_data: list[list],
    config: EngineConfig,
    checkpoint: set[str] | None = None,
    robots: dict[str, list[str]] | None = None,
) -> OracleResult:
    """Full sequential crawl replay (main.py:21-175). ``robots`` maps
    host -> disallow path prefixes (engine-only gate; the reference
    has none — enabled runs apply it before fetching, matching the
    engine's pre-schedule gate)."""
    from urllib.parse import urlparse

    res = OracleResult()
    fs = _FakeFS()
    data = strip_header(cdx_data)
    if config.canonicalize_urls:
        # mirror the engine's opt-in canonicalization: rewrite each
        # record's url through the SAME python kernel BEFORE the
        # latest-per-URL dedup (checkpoint urls too)
        from ..content.paths import canonical_url

        data = [
            ([canonical_url(r[0])] + list(r[1:]))
            if isinstance(r, list) and r and isinstance(r[0], str)
            else r
            for r in data
        ]
        checkpoint = {canonical_url(u) for u in (checkpoint or set())}
    processed_urls = set(checkpoint or set())
    latest = process_cdx_oracle(data)

    for url, ts in latest.items():
        if url in processed_urls:
            continue
        res.crawl_order.append(url)

        if robots is not None:
            parsed = urlparse(url)
            rules = robots.get(parsed.netloc, [])
            if any((parsed.path or "").startswith(p) for p in rules):
                res.failed.append((url, "robots_blocked"))
                continue

        html = _fetch_with_retries(url, config.max_retries)

        if not html:
            # --- Memento fallback (main.py:71-93, memento_client.py) ---
            m = memento_outcome(url)
            if m == "ok":
                title, md = extract_and_convert_content(
                    page_html(url), url, config, saved_assets_map={}
                )
                if title and md:
                    dirpath = page_dir(url, config.output_dir)
                    base = markdown_base_filename(title, url)
                    fname = _save_with_collisions_md(fs, dirpath, base, ".md")
                    if fname:
                        res.docs.append(
                            dict(
                                url=url,
                                ts=MEMENTO_NOW_TS,
                                via="memento",
                                title=title,
                                dir=dirpath,
                                filename=fname,
                                markdown=markdown_file_bytes(title, md, url, MEMENTO_NOW_TS),
                            )
                        )
                        processed_urls.add(url)
                        res.seen.append(url)
                        continue
                res.failed.append((url, "memento_extract_or_save_fail"))
                continue
            res.failed.append((url, f"dead_{m}"))
            continue

        # --- Wayback success path ---
        saved_assets_map: dict[str, str] = {}
        assets_found = find_assets(html, url, config)
        page_captions: dict[str, str] | None = None
        for kind in config.enabled_asset_kinds:
            for asset_url in assets_found.get(kind, []):
                content = asset_bytes(asset_url)
                if not content:
                    continue
                if kind == "img":
                    from ..content.imagecodec import decode_image, phash64
                    from ..content.paths import xxhash64_str
                    from ..datagen import asset_image_format
                    from ..operators.images import extract_captions_kernel

                    fmt = asset_image_format(asset_url)
                    if fmt is not None:
                        if page_captions is None:
                            page_captions = {}
                            for a, c in extract_captions_kernel(html, url, config.target_domain):
                                page_captions.setdefault(a, c)  # first doc-order wins
                        try:
                            px = decode_image(content, fmt)
                            res.images.append(
                                dict(
                                    image_id=str(xxhash64_str(f"{url}|{asset_url}")),
                                    w=px.shape[1],
                                    h=px.shape[0],
                                    fmt=fmt,
                                    caption=page_captions.get(asset_url, ""),
                                    phash=phash64(px),
                                    nbytes=len(content),
                                )
                            )
                        except Exception:
                            pass
                pdir = page_dir(url, config.output_dir)
                adir = posixpath.join(pdir, "_assets", asset_type_dir(kind))
                base, ext = asset_base_and_ext(asset_url)
                fname = _save_with_collisions_asset(fs, adir, base, ext)
                if fname:
                    local = posixpath.join(adir, fname)
                    saved_assets_map[asset_url] = local
                    res.assets.append(
                        dict(
                            page_url=url,
                            asset_url=asset_url,
                            kind=kind,
                            dir=adir,
                            filename=fname,
                            nbytes=len(content),
                        )
                    )

        title, md = extract_and_convert_content(html, url, config, saved_assets_map)

        # SNK2 (file_handler.py:156-201, gate main.py:148-152): original
        # HTML is saved whenever a title exists — even if the markdown
        # conversion below fails (the md-empty page still claims a
        # .html name). Wayback path only; memento never saves html.
        if config.save_original_html and title:
            dirpath = page_dir(url, config.output_dir)
            base = markdown_base_filename(title, url)
            hname = _save_with_collisions_md(fs, dirpath, base, ".html")
            if hname:
                res.htmls.append(
                    dict(
                        url=url,
                        ts=ts,
                        title=title,
                        dir=dirpath,
                        filename=hname,
                        html=html,
                    )
                )

        if not title or not md:
            res.failed.append((url, "extract_fail"))
            continue

        dirpath = page_dir(url, config.output_dir)
        base = markdown_base_filename(title, url)
        fname = _save_with_collisions_md(fs, dirpath, base, ".md")
        if not fname:
            res.failed.append((url, "save_fail"))
            continue
        res.docs.append(
            dict(
                url=url,
                ts=ts,
                via="wayback",
                title=title,
                dir=dirpath,
                filename=fname,
                markdown=markdown_file_bytes(title, md, url, ts),
            )
        )
        processed_urls.add(url)
        res.seen.append(url)

    return res
