"""Engine configuration.

Mirrors the reference's validated flat-JSON config
(/root/reference/config_loader.py:7-77, config.json:1-24,
constants.py) as a frozen dataclass. In the distributed engine the
config rides along as a broadcast variable / plan-time literals —
conditional stages (download_js/css/img) prune at plan time via
literal folding (reference gates them imperatively, main.py:104-107).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

# Defaults from /root/reference/constants.py
DEFAULT_OUTPUT_DIR = "output"
INDEX_FILENAME_BASE = "index"
UNTITLED_FILENAME = "untitled"
ASSET_FALLBACK_FILENAME_BASE = "asset"
ASSETS_DIR_NAME = "_assets"
JS_DIR_NAME = "js"
CSS_DIR_NAME = "css"
IMG_DIR_NAME = "img"
UNKNOWN_ASSET_DIR_NAME = "_unknown"
HOMEPAGE_TITLE = "Homepage"
FILENAME_MAX_LENGTH = 100
DEFAULT_ASSET_FILENAME = "downloaded_asset"
FILENAME_COLLISION_LIMIT = 100
DEFAULT_REQUEST_DELAY = 1.0
DEFAULT_MAX_RETRIES = 3

# Reference config.json:4-11 — selector search order is semantic
DEFAULT_CONTENT_SELECTORS = (
    "#content",
    "main",
    ".main-content",
    ".entry-content",
    "article",
    "body",
)


@dataclass(frozen=True)
class EngineConfig:
    """Validated engine config (reference config_loader.py:16-24 keys).

    ``request_delay_seconds`` is pinned to the *documented* semantics
    (reference README.md:66: inter-request delay per host) rather than
    the code's retry-backoff-base-only behavior
    (decorators.py:59-60,90) — see SURVEY.md §2.10. The oracle applies
    the same budget so crawl ordering matches.
    """

    target_domain: str = "example.com"
    content_selectors: tuple[str, ...] = DEFAULT_CONTENT_SELECTORS
    request_delay_seconds: float = 1.5
    max_retries: int = DEFAULT_MAX_RETRIES
    download_js: bool = False
    download_css: bool = True
    download_images: bool = True
    save_original_html: bool = True
    rewrite_asset_links: bool = True
    output_dir: str = DEFAULT_OUTPUT_DIR

    # Engine-only (no reference analog): epoch scheduling knobs.
    # Per-epoch per-host fetch budget = epoch_seconds / delay tokens.
    epoch_seconds: float = 30.0
    # Salting factor for skewed-host aggregations/top-k (SURVEY §4).
    host_salt_buckets: int = 8
    # Partition count for the url_seen hash partitioning (xxhash64).
    seen_partitions: int = 32
    # Bloom prefilter sizing.
    bloom_fpp: float = 0.01
    # Robots gate (engine-only; the reference has none — SURVEY §2.10).
    # Off by default so reference-equality runs are unaffected; the
    # oracle applies the same rules when enabled.
    respect_robots: bool = False
    # Frontier link expansion (depth+1 from discovered links); the
    # reference crawls only the CDX list, so this is off for
    # equality runs.
    expand_links: bool = False
    max_depth: int = 2

    def __post_init__(self) -> None:
        if self.request_delay_seconds < 0:
            raise ValueError("request_delay_seconds must be non-negative")
        if self.max_retries < 0:
            raise ValueError("max_retries must be a non-negative integer")

    @property
    def per_host_epoch_budget(self) -> int:
        """Token-bucket capacity per host per epoch (>=1)."""
        if self.request_delay_seconds <= 0:
            return 1_000_000
        return max(1, int(self.epoch_seconds / self.request_delay_seconds))

    @property
    def enabled_asset_kinds(self) -> tuple[str, ...]:
        kinds = []
        if self.download_js:
            kinds.append("js")
        if self.download_css:
            kinds.append("css")
        if self.download_images:
            kinds.append("img")
        return tuple(kinds)

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)
