"""Single-threaded pure-Python reference crawler (FIXTURES.md F7).

Mirrors the CrawlEngine's semantics with plain dicts and loops:
same canonicalization, same portable hash, same per-batch politeness
caps, same deterministic ordering (depth asc, priority desc,
url_hash asc), same dedup-at-enqueue seen set. The Spark engine must
reproduce this oracle's crawl order and final seen set exactly
(north rule).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import re
from dataclasses import dataclass, field

_URL_RX = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?")


def canonicalize_url(url: str) -> str:
    m = _URL_RX.match(url)
    if not m:
        return url
    scheme = (m.group(1) or "").lower()
    auth = (m.group(2) or "").lower()
    path = m.group(3) or ""
    query = m.group(4) or ""
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    path = re.sub(r"/+$", "", path)
    if path == "":
        path = "/"
    q = "&".join(sorted(query.split("&"))) if query else ""
    return f"{scheme}://{auth}{path}" + (f"?{q}" if q else "")


def portable_hash64(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def url_host(url: str) -> str:
    m = _URL_RX.match(url)
    auth = (m.group(2) or "").lower() if m else ""
    return re.sub(r":[0-9]+$", "", auth)


def url_path(url: str) -> str:
    m = _URL_RX.match(url)
    p = (m.group(3) or "") if m else ""
    return p if p else "/"


@dataclass
class OracleCrawler:
    pages: dict[str, dict]  # canonical_url -> {html, text, lang, warc_ts}
    politeness: dict[str, int]  # host -> max_per_batch
    robots: dict[str, list[str]] = field(default_factory=dict)
    default_per_host: int = 8
    batch_cap: int = 1 << 30

    def __post_init__(self):
        self.pending: dict[str, tuple[int, int, int]] = {}  # url -> (depth, prio, hash)
        self.seen: set[int] = set()
        self.order: list[tuple[int, int, str]] = []  # (batch, seq, url)
        self.metrics: list[dict] = []

    @classmethod
    def from_rows(cls, page_rows, politeness_rows, robots_rows=None, **kw):
        """page_rows: iterable of dicts with url/warc_ts/html/text/lang.
        Duplicate canonical urls resolve by min (warc_ts, html) — the
        engine's tie-break."""
        pages: dict[str, dict] = {}
        for r in page_rows:
            cu = canonicalize_url(r["url"])
            key = (r["warc_ts"], bytes(r["html"]))
            if cu not in pages or key < (pages[cu]["warc_ts"], bytes(pages[cu]["html"])):
                pages[cu] = dict(r, warc_ts=r["warc_ts"])
        pol = {r["host"]: int(r["max_per_batch"]) for r in politeness_rows}
        rob = {r["host"]: list(r["disallow"]) for r in (robots_rows or [])}
        return cls(pages=pages, politeness=pol, robots=rob, **kw)

    def seed(self, seeds: list[tuple[str, int]]) -> None:
        best: dict[str, int] = {}
        for url, prio in seeds:
            cu = canonicalize_url(url)
            best[cu] = max(best.get(cu, -(1 << 31)), int(prio))
        for cu, prio in best.items():
            self.pending[cu] = (0, prio, portable_hash64(cu))
            self.seen.add(portable_hash64(cu))

    def _blocked(self, url: str) -> bool:
        dis = self.robots.get(url_host(url))
        if not dis:
            return False
        p = url_path(url)
        return any(p.startswith(d) for d in dis)

    def run_batch(self, batch_id: int) -> dict:
        cands = [
            (d, -p, h, u)
            for u, (d, p, h) in self.pending.items()
            if not self._blocked(u)
        ]
        cands.sort()
        taken: list[tuple[int, int, int, str]] = []
        host_used: dict[str, int] = {}
        for d, negp, h, u in cands:
            host = url_host(u)
            cap = self.politeness.get(host, self.default_per_host)
            if host_used.get(host, 0) < cap:
                host_used[host] = host_used.get(host, 0) + 1
                taken.append((d, negp, h, u))
        taken.sort()
        taken = taken[: self.batch_cap]
        fetched = parsed_ok = text_match = discovered = new = 0
        links_found: dict[str, int] = {}
        for seq, (d, negp, h, u) in enumerate(taken):
            self.order.append((batch_id, seq, u))
            del self.pending[u]
            fetched += 1
            page = self.pages.get(u)
            if page is None:
                continue
            try:
                body = json.loads(gzip.decompress(bytes(page["html"])).decode("utf-8"))
                parsed_ok += 1
                if body.get("text") == page["text"]:
                    text_match += 1
                for link in body.get("links", []):
                    cl = canonicalize_url(link)
                    nd = d + 1
                    if cl not in links_found or nd < links_found[cl]:
                        links_found[cl] = nd
            except Exception:  # noqa: BLE001
                pass
        discovered = len(links_found)
        for cl, nd in links_found.items():
            h = portable_hash64(cl)
            if h not in self.seen:
                self.seen.add(h)
                self.pending[cl] = (nd, 0, h)
                new += 1
        m = {
            "batch": batch_id,
            "fetched": fetched,
            "parsed_ok": parsed_ok,
            "text_match": text_match,
            "discovered": discovered,
            "new_urls": new,
            "deduped": discovered - new,
        }
        if fetched:
            self.metrics.append(m)
        return m

    def run(self, max_batches: int = 1000) -> None:
        for b in range(1, max_batches + 1):
            if self.run_batch(b)["fetched"] == 0:
                break
