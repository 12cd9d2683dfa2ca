"""hw1 crawler behavioral port: filters, scores, frontier, budget, robots.

Reference semantics: hw1/code/crawler.py (frontier PQ, per-page top-50,
discovery-count link score, robots/blacklist/regex/dedup filters).
"""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wse_ray.crawl import (
    BLACK_LIST,
    SEED_PRIORITY,
    crawl,
    extract_hrefs,
    make_web_store,
    normalize_link,
)


def test_extract_hrefs_and_normalize():
    html = '<a href="/x">a</a><A HREF=\'https://d.example/y?q=1#f\'>b</A><a id="z" href="#top">c</a>'
    assert extract_hrefs(html) == ["/x", "https://d.example/y?q=1#f", "#top"]
    # relative resolves against parent; query+fragment dropped; '/' stripped
    assert normalize_link("/x/", "https://p.example/page") == "https://p.example/x"
    assert normalize_link("https://d.example/y?q=1#f", "https://p.example/p") == "https://d.example/y"
    assert normalize_link("#top", "https://p.example/p") is None
    assert normalize_link("a", "https://p.example/p") is None  # len <= 1


def _write_store(path, rows):
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "status": pa.array([r[1] for r in rows], pa.int64()),
            "html": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, path)
    return path


def test_crawl_filters_scores_and_budget(ray_session, tmp_path):
    """Hand-verifiable 2-round crawl: filters (blacklist, '#', robots,
    regex, dedup), the discovery-count score formula, and the
    404-does-not-consume-budget rule."""
    store = _write_store(
        str(tmp_path / "web.parquet"),
        [
            ("https://a.example/robots.txt", 200, "User-agent: *\nDisallow: /private\n"),
            (
                "https://a.example/seed",
                200,
                "<html>"
                '<a href="/p1">1</a>'
                '<a href="/p2">2</a>'
                '<a href="/pic.png">x</a>'       # blacklisted extension
                '<a href="#frag">x</a>'          # anchor skip
                '<a href="/private/x">x</a>'     # parent-robots disallow
                '<a href="/missing">m</a>'       # 404 when fetched
                "</html>",
            ),
            ("https://a.example/p1", 200, "<html>p1</html>"),
            ("https://a.example/p2", 200, "<html>p2</html>"),
            ("https://a.example/missing", 404, ""),
        ],
    )
    out = crawl(store, ["https://a.example/seed"], page_budget=10, round_size=1, concurrency=1)
    log = out["log"]
    # seed first at priority 1000 (stored as -prio of -1000)
    assert log.iloc[0]["url"] == "https://a.example/seed"
    assert log.iloc[0]["priority"] == -SEED_PRIORITY
    # 3 links survive the filters: p1, p2, missing
    assert log.iloc[0]["n_links_enqueued"] == 3
    # all 3 discovered urls tie on score (1/3 + 1/1 each) -> url-ascending order
    crawled = log["url"].tolist()
    assert crawled == [
        "https://a.example/seed",
        "https://a.example/missing",
        "https://a.example/p1",
        "https://a.example/p2",
    ]
    # score = url_num/len(url_num) + len(domain_num)/domain_num
    #       = 1/3 (1 discovery of 3 urls) + 1/3 (1 domain, 3 discoveries on it)
    assert abs(log.iloc[1]["priority"] - (1 / 3 + 1 / 3)) < 1e-9
    # 404 page logged but NOT counted in the sample budget
    assert log[log["url"] == "https://a.example/missing"].iloc[0]["status"] == 404
    assert out["stats"]["pages_in_sample"] == 3  # seed + p1 + p2
    assert out["stats"]["visited"] == 4
    # no url crawled twice
    assert log["url"].is_unique


def test_crawl_per_site_cap_and_missing_robots(ray_session, tmp_path):
    links = "".join(f'<a href="/p{i}">x</a>' for i in range(6))
    store = _write_store(
        str(tmp_path / "web.parquet"),
        [
            ("https://a.example/robots.txt", 200, "User-agent: *\n"),
            ("https://a.example/seed", 200, f"<html>{links}</html>"),
            # no robots.txt for b.example: its pages must yield NO links
            ("https://b.example/seed", 200, f"<html>{links}</html>"),
        ]
        + [(f"https://a.example/p{i}", 200, "<html>x</html>") for i in range(6)]
        + [(f"https://b.example/p{i}", 200, "<html>x</html>") for i in range(6)],
    )
    out = crawl(
        store,
        ["https://a.example/seed", "https://b.example/seed"],
        page_budget=20,
        round_size=4,
        limit_per_site=2,  # cap below the 6 available links
        concurrency=2,
    )
    log = out["log"].set_index("url")
    assert log.loc["https://a.example/seed"]["n_links_enqueued"] == 2
    assert log.loc["https://b.example/seed"]["n_links_enqueued"] == 0  # robots quirk
    assert out["stats"]["pages_in_sample"] == 4  # 2 seeds + 2 capped links


def test_crawl_synthetic_store_deterministic(ray_session, tmp_path):
    store = make_web_store(str(tmp_path / "store.parquet"), n_domains=4, pages_per_domain=6)
    seeds = ["https://site0.example/page0", "https://site1.example/page0"]
    out1 = crawl(store, seeds, page_budget=25, round_size=8)
    out2 = crawl(store, seeds, page_budget=25, round_size=8)
    import pandas as pd

    pd.testing.assert_frame_equal(out1["log"], out2["log"])
    assert out1["stats"] == out2["stats"]
    # reachable set: all of site0-2 (6 pages each) + site3's pages 0 and 3
    # (site3 has no robots -> its pages yield no links; only even/odd cross
    # links from site2 discover pages 0 and 3) = 20 < budget 25: the crawl
    # must stop on frontier exhaustion, not hang
    assert out1["stats"]["pages_in_sample"] == 20
    log = out1["log"]
    assert log["url"].is_unique
    # blacklisted/disallowed/anchor urls never crawled
    assert not log["url"].str.contains("png|private|#").any()
    # language mix present (marker-word pages)
    assert log[log["status"] == 200]["lang"].nunique() >= 2


def test_crawl_blacklist_is_reference_set():
    # pinned from hw1/code/crawler.py:28-32
    assert {".jpg", ".pdf", ".php", ".iso", ".svg"} <= BLACK_LIST
    assert len(BLACK_LIST) == 25
