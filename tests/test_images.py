"""Image payload fidelity gates (BASELINE.json:6,15): lossless decode
exact, lossy roundtrip PSNR>=40dB, phash stability, caption
byte-equality vs the reference extractor semantics."""

import numpy as np
from pyspark.sql import functions as F

from web_archive_downloader_spark.content.extract import extract_and_convert_content
from web_archive_downloader_spark.content.imagecodec import decode_image
from web_archive_downloader_spark.datagen import default_config, gen_images, page_html, gen_urls
from web_archive_downloader_spark.operators.images import (
    decode_validate_stage,
    extract_captions_stage,
    images_df,
)


def test_decode_validate_distributed(spark):
    imgs = images_df(spark, n=48)
    out = decode_validate_stage(imgs).collect()
    assert len(out) == 48
    for r in out:
        assert r.decode_ok
        assert (r.dec_w, r.dec_h) == (32, 32)
        if r.fmt == "png":
            assert r.phash_hamming == 0  # lossless: exact phash
            assert r.roundtrip_psnr is None
        else:
            assert r.phash_hamming <= 4  # lossy: near-identical
            assert r.roundtrip_psnr is None or r.roundtrip_psnr >= 40.0


def test_decoded_pixels_allclose_vs_oracle(spark):
    """Per-row invariant: distributed decode == driver (oracle) decode,
    exactly — the decode kernel is deterministic and shared."""
    rows = gen_images(16, seed=9)
    imgs = spark.createDataFrame(rows)
    got = {r.image_id: (r.dec_phash, r.dec_w, r.dec_h) for r in decode_validate_stage(imgs).collect()}
    from web_archive_downloader_spark.content.imagecodec import phash64

    for row in rows:
        px = decode_image(row["bytes"], row["fmt"])
        assert got[row["image_id"]] == (phash64(px), px.shape[1], px.shape[0])


def test_lossy_psnr_gate():
    """PSNR >= 40 dB for the lossy path on every fixture image."""
    from web_archive_downloader_spark.content.imagecodec import (
        decode_fake_jpeg,
        encode_fake_jpeg,
        psnr,
    )

    rng = np.random.default_rng(3)
    for _ in range(8):
        px = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
        assert psnr(px, decode_fake_jpeg(encode_fake_jpeg(px))) >= 40.0


def test_caption_extraction_matches_reference_semantics(spark):
    """Captions (img alt) must byte-match what the reference's
    markdown pipeline embeds as ![alt](src) for the same page."""
    cfg = default_config()
    urls = [u for u in gen_urls(40) if "![" not in u]
    pages = spark.createDataFrame(
        [(u, page_html(u)) for u in urls], ["url", "html"]
    )
    # one row per <img> tag: the same asset URL may carry different
    # captions on one page, so compare as a triple set
    got = {
        (r.page_url, r.asset_url, r.caption)
        for r in extract_captions_stage(pages, cfg.target_domain).collect()
    }
    # oracle: captions are exactly the alt texts that appear in the
    # reference markdown output ![alt](path)
    import re

    checked = 0
    for u in urls:
        title, md = extract_and_convert_content(page_html(u), u, cfg, {})
        if not md:
            continue
        for alt, src in re.findall(r"!\[([^\]]*)\]\(([^)]+)\)", md):
            if src.startswith("data:") or "cdn.other.com" in src:
                continue
            from urllib.parse import urljoin

            abs_src = urljoin(u, src)
            if any(g[0] == u and g[1] == abs_src for g in got):
                assert (u, abs_src, alt) in got
                checked += 1
    assert checked >= 10  # the lattice actually exercised captions


def test_phash_near_dups_blocking_exact(spark):
    """phash near-dup pairs: the pigeonhole-blocked join finds EXACTLY
    the pairs an all-pairs hamming scan finds (<= max_hamming), with
    correct distances — planted near-identical phashes and random
    distant ones."""
    import itertools
    import random

    import pandas as pd

    from web_archive_downloader_spark.operators.images import phash_near_dups

    rng = random.Random(7)
    base = rng.getrandbits(63)
    rows = [
        ("img00", base),
        ("img01", base ^ 1),            # hamming 1
        ("img02", base ^ (1 << 40)),    # hamming 1
        ("img03", base),                # hamming 0 (exact dup)
    ]
    for i in range(4, 40):
        rows.append((f"img{i:02d}", rng.getrandbits(63)))
    pdf = pd.DataFrame(rows, columns=["image_id", "phash"])
    df = spark.createDataFrame(pdf)

    got = {
        (r.img_a, r.img_b): r.hamming
        for r in phash_near_dups(df, max_hamming=6).collect()
    }
    exp = {}
    for (ia, pa), (ib, pb) in itertools.combinations(rows, 2):
        ham = bin(pa ^ pb).count("1")
        if ham <= 6:
            a, b = sorted((ia, ib))
            exp[(a, b)] = ham
    assert got == exp
    assert got[("img00", "img01")] == 1
    assert got[("img00", "img03")] == 0
