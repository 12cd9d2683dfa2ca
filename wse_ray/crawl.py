"""hw1 web crawler re-expressed Ray-Data-first, without live network.

Behavioral port of ``hw1/code/crawler.py`` (the reference's threaded
BFS-with-priorities crawler): seed URLs enter a global priority frontier at
priority -1000 (crawler.py:331), worker threads pop the best URL, fetch it,
language-classify the content, extract ``//a/@href`` links, normalize and
filter them (length/'#' skip, extension blacklist crawler.py:28-32, robots
can_fetch, ``^https?://\\w.+$``, visited-set dedup, crawler.py:204-218),
score each surviving link ``url_num[url]/len(url_num) +
len(domain_num)/domain_num[domain]`` (crawler.py:283-287) and push the
top-50 per page (crawler.py:258-271) back into the frontier until the page
budget is spent.

Re-expression (this module):

* **Fetch is an injectable actor-pool stage** (``PageStoreFetcher``): this
  container has no network, so the default fetcher resolves URLs against a
  LOCAL page-store parquet table (url -> status, html) loaded once per
  actor — the reference's ``requests.get(url, timeout=2)`` is the one
  environment-bound line, stubbed exactly like the LLM snippet client
  (snippets_llm.py); a real HTTP fetcher implements the same
  ``fetch(urls) -> (status, html)`` surface.
* **Frontier/counters are coordinator state** — the faithful image of the
  reference's ``crawl_lock``-guarded globals (vis_url, url_num,
  domain_num, link_queue).  At web scale this state shards by domain hash
  across frontier actors (per-domain politeness then falls out of the
  sharding); the per-round fetch+parse fan-out below is already the
  distributed part.
* **Deterministic BSP rounds**: up to ``round_size`` frontier URLs fetch
  and parse in parallel per round; their link/count/score updates then
  apply sequentially in frontier-priority order — the reference's
  single-URL-per-thread interleaving made counts (and so scores)
  nondeterministic; priority order within a round is preserved exactly.

Pinned deviations from the reference:

* link extraction uses a byte-regex over ``<a ... href="...">`` (no lxml
  in this container) instead of ``etree.HTML(text).xpath("//a/@href")``;
* language ID uses the repo's deterministic marker heuristic
  (functions/textstats.LANG_MARKERS — the declared pycld2 stand-in, so
  the reference's zh/pl/es sample set becomes ``sample_langs``);
* the reference's second filter loop re-checks robots/visited against a
  STALE loop variable (``url`` left over from the first loop,
  crawler.py:240-242) — effectively a no-op; this port applies the
  first-loop filters once, correctly;
* scores use the deterministic count state described above.
"""
from __future__ import annotations

import heapq
import os
import re
from collections import Counter
from urllib.parse import urljoin, urlparse
from urllib.robotparser import RobotFileParser

import numpy as np
import pandas as pd
import pyarrow as pa

# crawler.py:28-32, verbatim
BLACK_LIST = {
    ".jpg", ".jpeg", ".img", ".png", ".gif",
    ".mp3", ".mp4", ".cgi", ".asp", ".aspx", ".pdf",
    ".wav", ".avi", ".wmv", ".flv", ".jsp", ".js",
    ".php", ".read", ".do", ".htm", ".svg",
    ".py", ".python", ".iso",
}
_URL_RE = re.compile(r"^https?:/{2}\w.+$")  # crawler.py:216
_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"']*)["']""", re.IGNORECASE)
SEED_PRIORITY = -1000.0  # crawler.py:331


def extract_hrefs(html: str) -> list[str]:
    """All ``<a href>`` values in document order (regex stand-in for the
    reference's ``//a/@href`` xpath; no lxml in this container)."""
    return _HREF_RE.findall(html)


def normalize_link(link: str, parent_url: str) -> str | None:
    """Reference link normalization (crawler.py:204-208): skip empty/'#'
    links, resolve scheme/netloc against the parent, join the PATH only
    (query and fragment are DROPPED — faithful) and strip a trailing '/'."""
    if len(link) <= 1 or link[0] == "#":
        return None
    try:
        parsed_link = urlparse(link)
        parsed_url = urlparse(parent_url)
        base = (
            f"{parsed_link.scheme or parsed_url.scheme}://"
            f"{parsed_link.netloc or parsed_url.netloc}"
        )
        return urljoin(base, parsed_link.path).rstrip("/")
    except ValueError:
        return None


class RobotsPolicy:
    """Per-domain robots.txt rules parsed once from the page store.

    Faithful quirk (crawler.py:190-197): if a page's domain has NO
    fetchable robots.txt, link extraction for that page is abandoned
    entirely (the reference's bare ``return`` inside the try block) — the
    page itself still counts toward the budget."""

    def __init__(self, robots_bodies: dict[str, str]):
        self._parsers: dict[str, RobotFileParser] = {}
        for domain, body in robots_bodies.items():
            rp = RobotFileParser()
            rp.parse(body.splitlines())
            self._parsers[domain] = rp

    def known(self, domain: str) -> bool:
        return domain in self._parsers

    def parser_for(self, domain: str) -> RobotFileParser | None:
        return self._parsers.get(domain)


class PageStoreFetcher:
    """Actor-pool fetch+parse stage: url rows -> (url, status, html, lang,
    links).  ``__init__`` loads the page store ONCE per actor (the stateful
    setup); ``__call__`` serves a batch of URLs.  A live-HTTP fetcher would
    replace only ``_fetch_one``."""

    def __init__(self, store_path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(store_path, columns=["url", "status", "html"])
        self._status = {}
        self._html = {}
        for u, s, h in zip(
            t["url"].to_pylist(), t["status"].to_pylist(), t["html"].to_pylist()
        ):
            self._status[u] = int(s)
            self._html[u] = h

    def _fetch_one(self, url: str) -> tuple[int, str | None]:
        if url not in self._status:  # connection error in reference terms
            return -1, None
        return self._status[url], self._html[url]

    def fetch_parse(self, urls: list[str]) -> pa.Table:
        from .functions.textstats import lang_id
        statuses, htmls, raw_links = [], [], []
        for u in urls:
            st, html = self._fetch_one(u)
            statuses.append(st)
            htmls.append(html if html is not None else "")
            raw_links.append(extract_hrefs(html) if (st == 200 and html) else [])
        lang_batch = pa.table(
            {
                "doc_id": pa.array(np.arange(len(urls), dtype=np.int64)),
                "text": pa.array(htmls, pa.large_string()),
            }
        )
        langs = lang_id(lang_batch)["pred_lang"].to_pylist()
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array(statuses, pa.int64()),
                "size": pa.array([len(h) for h in htmls], pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "links": pa.array(raw_links, pa.large_list(pa.string())),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        """map_batches-compatible shape for one-shot pipeline use."""
        return self.fetch_parse(batch["url"].to_pylist())


def _page_links(
    url: str,
    raw_links: list[str],
    robots: RobotsPolicy,
    vis_url: set,
    url_num: Counter,
    domain_num: Counter,
    limit_per_site: int,
) -> list[tuple[float, str]]:
    """One fetched page -> its top-``limit_per_site`` scored frontier
    candidates, replicating crawler.py:180-271 (filters, discovery counts,
    score, per-page top-k with the PQ's (score desc, url asc) order).

    Faithful quirk: EVERY link — cross-domain included — is checked against
    the PARENT page's robots parser (the reference builds one ``rp`` from
    ``org_url`` and calls ``rp.can_fetch`` on each link,
    crawler.py:190-216); a link's own domain's robots is never consulted at
    discovery time."""
    parent_domain = urlparse(url).netloc
    rp = robots.parser_for(parent_domain)
    if rp is None:
        return []  # robots fetch failed -> no links (pinned quirk)
    kept: list[str] = []
    seen_here = set()
    for link in raw_links:
        norm = normalize_link(link, url)
        if norm is None or norm in seen_here:
            continue
        _, ext = os.path.splitext(norm)
        if (
            ext.lower() in BLACK_LIST
            or not rp.can_fetch("*", norm)
            or not _URL_RE.match(norm)
            or norm in vis_url
        ):
            continue
        # discovery counts update PER LINK at discovery time (crawler.py:218-224)
        url_num[norm] += 1
        dom = urlparse(norm).netloc or parent_domain
        domain_num[dom] += 1
        seen_here.add(norm)
        kept.append(norm)
    # score with the post-discovery counts (crawler.py:283-287)
    scored = []
    for link in kept:
        dom = urlparse(link).netloc or parent_domain
        score = url_num[link] / len(url_num) + len(domain_num) / domain_num[dom]
        scored.append((-score, link))
    heapq.heapify(scored)
    out = []
    while scored and len(out) < limit_per_site:
        out.append(heapq.heappop(scored))
    return out


def crawl(
    store_path: str,
    seeds: list[str],
    page_budget: int,
    round_size: int = 32,
    limit_per_site: int = 50,
    sample_langs: tuple = ("es", "zh"),
    concurrency: int = 4,
) -> dict:
    """Run the crawl; returns {"log": DataFrame, "stats": dict}.

    The log has one row per POPPED url in crawl order: (ord, round, url,
    priority, status, size, lang, in_sample, n_links_enqueued) — the image
    of the reference's per-URL ``logger.critical`` lines; ``stats`` mirrors
    its end-of-crawl summary (crawler.py:353-358)."""
    import pyarrow.parquet as pq

    import ray
    import ray.data

    robots_rows = pq.read_table(store_path, columns=["url", "status", "html"])
    robots_bodies = {
        urlparse(u).netloc: h
        for u, s, h in zip(
            robots_rows["url"].to_pylist(),
            robots_rows["status"].to_pylist(),
            robots_rows["html"].to_pylist(),
        )
        if u.endswith("/robots.txt") and int(s) == 200 and h is not None
    }
    robots = RobotsPolicy(robots_bodies)

    frontier: list[tuple[float, str]] = [(SEED_PRIORITY, u) for u in seeds]
    heapq.heapify(frontier)
    vis_url: set = set()
    url_num: Counter = Counter()
    domain_num: Counter = Counter()
    lang_counts: Counter = Counter()
    budget = page_budget
    log_rows = []
    rnd = 0
    ordinal = 0
    # a PERSISTENT fetch actor pool across rounds — the iterative shared-
    # frontier loop is the one place the Dataset API can't express the
    # stage, so raw actors are the right tool (store loaded once per actor,
    # not once per round)
    n_act = max(1, concurrency)
    FetchActor = ray.remote(PageStoreFetcher)
    actors = [FetchActor.remote(store_path) for _ in range(n_act)]
    try:
        while budget > 0 and frontier:
            batch: list[tuple[float, str]] = []
            while frontier and len(batch) < min(round_size, budget):
                prio, url = heapq.heappop(frontier)
                if url in vis_url:
                    continue
                vis_url.add(url)  # marked visited at pop time (crawler.py:103)
                batch.append((prio, url))
            if not batch:
                break
            urls = [u for _, u in batch]
            chunks = [
                list(c)
                for c in np.array_split(
                    np.asarray(urls, dtype=object), min(n_act, len(urls))
                )
                if len(c)
            ]
            fetched = (
                pa.concat_tables(
                    ray.get(
                        [
                            actors[i].fetch_parse.remote(c)
                            for i, c in enumerate(chunks)
                        ]
                    )
                )
                .to_pandas()
                .set_index("url")
            )
            # sequential state updates in frontier-priority order (determinism)
            for prio, url in batch:
                row = fetched.loc[url]
                status = int(row["status"])
                if status != 200:
                    # "not in the sample": budget NOT consumed (crawler.py:110-117)
                    log_rows.append(
                        (ordinal, rnd, url, -prio, status, 0, "und", False, 0)
                    )
                    ordinal += 1
                    continue
                enq = _page_links(
                    url, list(row["links"]), robots, vis_url, url_num,
                    domain_num, limit_per_site,
                )
                for item in enq:
                    heapq.heappush(frontier, item)
                lang = str(row["lang"])
                in_sample = lang in sample_langs
                if in_sample:
                    lang_counts[lang] += 1
                budget -= 1
                log_rows.append(
                    (
                        ordinal, rnd, url, -prio, status, int(row["size"]),
                        lang, in_sample, len(enq),
                    )
                )
                ordinal += 1
                if budget <= 0:
                    break
            rnd += 1
    finally:
        for a in actors:
            ray.kill(a)
    log = pd.DataFrame(
        log_rows,
        columns=[
            "ord", "round", "url", "priority", "status", "size", "lang",
            "in_sample", "n_links_enqueued",
        ],
    )
    pages = page_budget - budget
    stats = {
        "pages_in_sample": pages,
        "visited": len(vis_url),
        "rounds": rnd,
        **{
            f"pct_{lang}": (lang_counts[lang] / pages if pages else 0.0)
            for lang in sample_langs
        },
    }
    return {"log": log, "stats": stats}


# --------------------------------------------------------------------------
# deterministic synthetic web store (the no-network test universe)
# --------------------------------------------------------------------------


def make_web_store(
    out_path: str,
    n_domains: int = 6,
    pages_per_domain: int = 12,
    seed: int = 42,
) -> str:
    """Write a deterministic synthetic page-store parquet: per-domain
    robots.txt (one domain disallows /private, one domain has NO robots),
    interlinked pages (absolute + relative links, some '#' anchors, some
    blacklisted extensions, some 404s, some disallowed paths), and marker-
    word text in several languages so lang_id produces a mix."""
    import random

    import pyarrow.parquet as pq

    from .functions.textstats import LANG_MARKERS

    rng = random.Random(seed)
    domains = [f"site{d}.example" for d in range(n_domains)]
    langs = sorted(LANG_MARKERS)
    rows = []
    for di, dom in enumerate(domains):
        if di != n_domains - 1:  # last domain: robots MISSING (quirk path)
            rows.append(
                (
                    f"https://{dom}/robots.txt",
                    200,
                    "User-agent: *\nDisallow: /private\n",
                )
            )
        for p in range(pages_per_domain):
            url = f"https://{dom}/page{p}"
            lang = langs[(di + p) % len(langs)]
            words = sorted(LANG_MARKERS[lang]) * 3
            links = []
            for k in range(1, 4):  # same-domain relative links
                links.append(f"/page{(p + k) % pages_per_domain}")
            other = domains[(di + 1) % n_domains]
            links.append(f"https://{other}/page{(p * 3) % pages_per_domain}")
            links.append("#anchor")  # skipped
            links.append(f"/image{p}.png")  # blacklisted
            links.append(f"/private/secret{p}")  # robots-disallowed on site0
            if p % 5 == 4:
                links.append(f"/missing{p}")  # 404 target
            html = "<html><body>" + " ".join(words) + "".join(
                f'<a href="{l}">x</a>' for l in links
            ) + "</body></html>"
            status = 200
            rows.append((url, status, html))
        for p in range(pages_per_domain):
            rows.append((f"https://{dom}/missing{p}", 404, None))
            rows.append((f"https://{dom}/private/secret{p}", 200, "<html>private</html>"))
    rng.shuffle(rows)
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "status": pa.array([r[1] for r in rows], pa.int64()),
            "html": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pq.write_table(t, out_path)
    return out_path
