"""Deterministic fixture corpus generator (FIXTURES.md §1–3).

Synthesises the ``pages`` table (url, warc_ts, html, text, lang) exactly per
the driver's input_hint, plus the ``expected`` parity table computed AT
GENERATION TIME by the vendored oracle — fixtures and oracle cannot drift.

Everything derives from ``random.Random(seed)``; no wall clock, no network,
no set-iteration order dependence. Hosts are Zipf-skewed over 50 fake domains
to exercise host-domain skew; ~2% of urls are duplicated with strictly
distinct ``warc_ts`` to exercise MR-D1 dedup (latest wins).
"""

from __future__ import annotations

import codecs
import datetime as dt
import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from oracle import extract
from oracle.textnorm import norm_ws

_WORDS = (
    "storm coast city council vote market quake rally strike deal probe court "
    "crash budget tax river bridge mayor police fire school health union bank "
    "energy climate report plan crisis talks leader poll film festival team "
    "cup final record star chief minister border trade summit protest law"
).split()

_EXTRA_WORDS = ["café", "señor", "über", "naïve"]  # latin-1-safe unicode

_FIRST = "Jane John Ana Bo Carol David Emma Frank Grace Hugo Iris Jack Katia Liam Mona Nils".split()
_LAST = "Doe Smith Torres Li Jones Brown García Müller Rossi Novak Kim Patel Silva Olson".split()

_HOSTS = [f"news{i:02d}.example.com" for i in range(50)]

_LANGS = ["en", "en", "en", "en", "en", "es", "de", "fr", "zh"]

_SITES = ["The Daily Bugle", "Morning Post", "City Herald", "The Observer Times"]

_MONTH_NAMES = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]


def _zipf_host(rng: random.Random) -> str:
    # P(rank k) ∝ 1/(k+1); deterministic skew over 50 hosts
    weights = [1.0 / (k + 1) for k in range(len(_HOSTS))]
    return rng.choices(_HOSTS, weights=weights, k=1)[0]


def _mk_headline(rng: random.Random) -> str:
    n = rng.randint(3, 6)
    words = [rng.choice(_WORDS) for _ in range(n)]
    if rng.random() < 0.1:
        words[rng.randrange(n)] = rng.choice(_EXTRA_WORDS)
    return " ".join(w.capitalize() for w in words)


def _mk_authors(rng: random.Random) -> list[str]:
    k = rng.choices([1, 2, 3], weights=[70, 20, 10], k=1)[0]
    out = []
    for _ in range(k):
        name = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
        if name not in out:
            out.append(name)
    return out


def _textual_date(rng: random.Random, d: dt.datetime) -> str:
    """One of the Appendix-A.5 textual renderings of ``d``."""
    style = rng.randrange(6)
    mn = _MONTH_NAMES[d.month - 1]
    if style == 0:
        return d.strftime("%Y-%m-%d")
    if style == 1:
        suf = {1: "st", 2: "nd", 3: "rd"}.get(d.day % 10 if d.day not in (11, 12, 13) else 0, "th")
        return f"{d.day}{suf} {mn} {d.year}"
    if style == 2:
        return f"{mn[:3]} {d.day}, {d.year}"
    if style == 3:
        return f"{d.day}/{d.month}/{d.year}"
    if style == 4:
        return f"{d.day}/{d.month}/{d.year % 100:02d}"
    ampm = "am" if d.hour < 12 else "pm"
    h12 = d.hour % 12 or 12
    day_name = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"][d.weekday()]
    return f"{day_name} {d.day} {mn} {d.year} {h12}:{d.minute:02d}{ampm} GMT"


def _nav_farm(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/{rng.choice(_WORDS)}/{i}">{rng.choice(_WORDS)}</a> ' for i in range(rng.randint(8, 20))
    )
    return f"<nav>{links}</nav>"


def _compose(rng: random.Random, headline: str, authors: list[str], pub: dt.datetime):
    """Build one page's html (str) by sampling one variant per FIXTURES.md axis."""
    site = rng.choice(_SITES)
    slug = "-".join(headline.lower().split())[:60]

    # -- title axis
    t = rng.randrange(4)
    if t == 0:
        title = headline
    elif t == 1:
        title = f"{headline} | {site}"
    elif t == 2:
        title = f"{site} — {headline}"
    else:
        title = f"{rng.choice(_WORDS).capitalize()} {rng.choice(_WORDS)} daily brief"

    # -- headline placement axis
    h = rng.randrange(5)
    if h == 0:
        hl_html = f"<h1>{headline}</h1>"
    elif h == 1:
        hl_html = f'<h1 class="entry-title">{headline}</h1>'
    elif h == 2:
        hl_html = f'<h2 class="headline">{headline}</h2>'
    elif h == 3:
        hl_html = f'<div id="story-head">{headline}</div>'
    else:
        hl_html = ""  # headline only in <title>

    # -- pubdate axis (returns the html fragment; url-date handled by caller)
    p = rng.randrange(9)
    iso = pub.strftime("%Y-%m-%dT%H:%M:%S") + "Z"
    date_html, url_date = "", False
    if p == 0:
        date_html = f'<meta property="article:published_time" content="{iso}">'
    elif p == 1:
        date_html = f'<meta name="DC.date.issued" content="{pub.strftime("%Y-%m-%d")}">'
    elif p == 2:
        url_date = True
    elif p == 3:
        date_html = f'<time datetime="{iso}">{_textual_date(rng, pub)}</time>'
    elif p == 4:
        date_html = f"<time>{_textual_date(rng, pub)}</time>"
    elif p == 5:
        date_html = f'<abbr class="published" title="{pub.strftime("%Y-%m-%d")}">{_textual_date(rng, pub)}</abbr>'
    elif p == 6:
        date_html = f'<span class="date">{_textual_date(rng, pub)}</span>'
    elif p == 7:
        # conflicting: meta vs a different body date — meta must win
        other = pub - dt.timedelta(days=rng.randint(1, 300))
        date_html = (
            f'<meta property="article:published_time" content="{iso}">'
            f'<span class="date">{_textual_date(rng, other)}</span>'
        )
    # p == 8 → no date at all

    # -- authors axis
    a = rng.randrange(7)
    if not authors:
        a = 6
    by = ", ".join(authors[:-1]) + (" and " + authors[-1] if len(authors) > 1 else authors[0] if len(authors) == 1 else "")
    if len(authors) == 1:
        by = authors[0]
    auth_html = ""
    if a == 0:
        auth_html = f'<span class="byline">By {by}</span>'
    elif a == 1:
        auth_html = f'<a rel="author" href="/staff/{slug[:10]}">{authors[0]}</a>'
    elif a == 2:
        auth_html = f'<div class="vcard"><span class="fn">{authors[0]}</span></div>'
    elif a == 3:
        auth_html = f'<p class="byline">By {by}</p>'
    elif a == 4:
        auth_html = f'<p class="byline">By {authors[0]}, Editor</p>'
    elif a == 5:
        auth_html = '<p class="byline">Posted in Sports | 5 min read</p>'
    # a == 6 → none

    # -- noise axis
    noise_bits = []
    if rng.random() < 0.7:
        noise_bits.append(_nav_farm(rng))
    if rng.random() < 0.4:
        noise_bits.append(f"<h2>{rng.choice(_WORDS).capitalize()} {rng.choice(_WORDS)} roundup weekly</h2>")
    if rng.random() < 0.3:
        noise_bits.append("<script>var x = '<h1>not a headline</h1>';</script>")
    if rng.random() < 0.3:
        noise_bits.append("<!-- comment block <h1>still not</h1> -->")
    if rng.random() < 0.3:
        noise_bits.append(f"<p>Tension&nbsp;rises &amp; {rng.choice(_WORDS)}&#233;</p>")

    para_list = [
        f"<p>{' '.join(rng.choice(_WORDS) for _ in range(rng.randint(15, 40)))}.</p>"
        for _ in range(rng.randint(3, 10))
    ]

    # -- content-layout axis (A.6 main-text extraction)
    layout = rng.randrange(4)
    if layout == 0:
        body_content = "".join(para_list)  # flat: paragraphs directly in body
    elif layout == 1:
        body_content = f'<div class="article-body">{"".join(para_list)}</div>'
    elif layout == 2:
        # per-paragraph wrapper divs inside an article container
        body_content = (
            '<div id="main-content">'
            + "".join(f"<div>{p}</div>" for p in para_list)
            + "</div>"
        )
    else:
        body_content = f'<article>{"".join(para_list)}</article>'

    # -- boilerplate axis: long-but-negative subtrees the strip must drop
    boiler = []
    if rng.random() < 0.5:
        items = "".join(
            f'<li><a href="/{rng.choice(_WORDS)}">{" ".join(rng.choice(_WORDS) for _ in range(6))}</a></li>'
            for _ in range(rng.randint(3, 6))
        )
        boiler.append(f'<div class="sidebar related"><ul>{items}</ul></div>')
    if rng.random() < 0.4:
        boiler.append(
            '<div class="comments"><p>'
            + " ".join(rng.choice(_WORDS) for _ in range(rng.randint(20, 40)))
            + "</p></div>"
        )

    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>{date_html if date_html.startswith('<meta') else ''}"
        "</head><body>"
        f"{noise_bits[0] if noise_bits else ''}"
        f"{hl_html}{auth_html}"
        f"{date_html if not date_html.startswith('<meta') else ''}"
        f"{body_content}"
        f"{''.join(boiler)}"
        f"{''.join(noise_bits[1:])}"
        "<footer><a href='/about'>About</a><a href='/contact'>Contact</a></footer>"
        "</body></html>"
    )
    return html, slug, url_date


def _pad_body(rng: random.Random, html_s: str, min_page_bytes: int) -> str:
    """Pad the page body with filler paragraphs up to ``min_page_bytes`` —
    realistic ~50 KiB article pages for page-size-annotated benchmarks."""
    need = min_page_bytes - len(html_s)
    if need <= 0:
        return html_s
    paras = []
    while need > 0:
        p = "<p>" + " ".join(rng.choice(_WORDS) for _ in range(60)) + ".</p>"
        paras.append(p)
        need -= len(p)
    return html_s.replace("</body></html>", "".join(paras) + "</body></html>")


def generate(
    out_dir: str,
    n_rows: int = 2000,
    seed: int = 42,
    rows_per_file: int = 10_000,
    with_expected: bool = True,
    min_page_bytes: int = 0,
) -> dict[str, str]:
    """Write ``pages`` (and optionally ``expected``) Parquet under ``out_dir``.

    Returns {"pages": <file-or-dir path>, "expected": <file path>}.
    ``n_rows`` counts base rows; ~2% extra duplicate-url rows are appended.
    """
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)

    urls: list[str] = []
    tss: list[dt.datetime] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    def encode_page(html_s: str) -> bytes:
        enc = rng.random()
        if enc < 0.85:
            return html_s.encode("utf-8")
        if enc < 0.95:
            return html_s.encode("latin-1", "replace")
        return codecs.BOM_UTF8 + html_s.encode("utf-8")

    base: list[tuple[str, dt.datetime, bytes, str, str]] = []
    for _ in range(n_rows):
        headline = _mk_headline(rng)
        authors = _mk_authors(rng) if rng.random() < 0.9 else []
        pub = dt.datetime(2010, 1, 1) + dt.timedelta(
            seconds=rng.randrange(int((dt.datetime(2024, 12, 31) - dt.datetime(2010, 1, 1)).total_seconds()))
        )
        pub = pub.replace(microsecond=0)
        html_s, slug, url_date = _compose(rng, headline, authors, pub)
        if min_page_bytes:
            html_s = _pad_body(rng, html_s, min_page_bytes)
        host = _zipf_host(rng)
        if url_date or rng.random() < 0.6:
            url = f"https://{host}/{pub.year}/{pub.month:02d}/{pub.day:02d}/{slug}.html"
        else:
            url = f"https://{host}/news/{slug}-{rng.randrange(10_000)}"
        # warc_ts strictly after pub (sanity window holds), within [2019, 2026)
        lo = max(pub + dt.timedelta(days=1), dt.datetime(2019, 1, 1))
        span = int((dt.datetime(2026, 1, 1) - lo).total_seconds())
        ts = lo + dt.timedelta(seconds=rng.randrange(max(span, 1)))
        ts = ts.replace(microsecond=0)

        r = rng.random()
        if r < 0.005:
            raw = b""
        elif r < 0.015:
            raw = bytes(rng.randrange(256) for _ in range(rng.randint(10, 400)))
        else:
            raw = encode_page(html_s)
        base.append((url, ts, raw, norm_ws(html_s), rng.choice(_LANGS)))

    # ~2% duplicate urls with strictly distinct warc_ts and variant html
    n_dups = max(1, int(0.02 * n_rows))
    for _ in range(n_dups):
        url, ts, raw, text, lang = base[rng.randrange(len(base))]
        ts2 = ts + dt.timedelta(seconds=rng.randint(3600, 86400 * 200))
        headline = _mk_headline(rng)
        html_s, _, _ = _compose(rng, headline, _mk_authors(rng), ts - dt.timedelta(days=3))
        if min_page_bytes:
            html_s = _pad_body(rng, html_s, min_page_bytes)
        base.append((url, ts2.replace(microsecond=0), encode_page(html_s), norm_ws(html_s), lang))

    order = list(range(len(base)))
    rng.shuffle(order)
    for i in order:
        url, ts, raw, text, lang = base[i]
        urls.append(url)
        tss.append(ts)
        htmls.append(raw)
        texts.append(text)
        langs.append(lang)

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    table = pa.table(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs},
        schema=schema,
    )

    paths: dict[str, str] = {}
    if len(urls) <= rows_per_file:
        pages_path = os.path.join(out_dir, "pages.parquet")
        pq.write_table(table, pages_path)
        paths["pages"] = pages_path
    else:
        pages_dir = os.path.join(out_dir, "pages")
        os.makedirs(pages_dir, exist_ok=True)
        for fi, start in enumerate(range(0, len(urls), rows_per_file)):
            pq.write_table(
                table.slice(start, rows_per_file),
                os.path.join(pages_dir, f"pages-{fi:04d}.parquet"),
            )
        paths["pages"] = pages_dir

    if with_expected:
        # MR-D1 winner per url: latest warc_ts, tie → smallest md5(html)
        winner: dict[str, tuple] = {}
        for url, ts, raw, text, lang in base:
            h = hashlib.md5(raw).hexdigest()
            cur = winner.get(url)
            if cur is None or (ts, _neg_lex(h)) > (cur[0], _neg_lex(cur[1])):
                winner[url] = (ts, h, raw)
        e_urls, e_heads, e_dates, e_auths, e_texts = [], [], [], [], []
        for url in sorted(winner):
            ts, _, raw = winner[url]
            r = extract(raw, url, ts)
            e_urls.append(url)
            e_heads.append(r.headline)
            e_dates.append(r.pubdate)
            e_auths.append(r.authors)
            e_texts.append(r.text)
        exp = pa.table(
            {
                "url": e_urls,
                "headline": e_heads,
                "pubdate": e_dates,
                "authors": e_auths,
                "text": e_texts,
            },
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("headline", pa.string()),
                    ("pubdate", pa.string()),
                    ("authors", pa.list_(pa.string())),
                    ("text", pa.string()),
                ]
            ),
        )
        exp_path = os.path.join(out_dir, "expected.parquet")
        pq.write_table(exp, exp_path)
        paths["expected"] = exp_path

    return paths


class _neg_lex(str):
    """Inverts lexicographic comparison → 'smallest md5 wins' under max()."""

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)

    def __gt__(self, other):  # type: ignore[override]
        return str.__lt__(self, other)


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fixture_corpus"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    print(generate(out, n_rows=n))
