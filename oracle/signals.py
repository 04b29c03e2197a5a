"""Normative signal tables (SURVEY.md Appendix A; spec id MR-A1).

One version-stamped module holding every pattern the extractor scores with.
The Ray engine's actor pool compiles/loads exactly these tables (it imports
this module), and ``SIGNALS_VERSION`` is recorded in the lineage sidecar so a
byte-identity claim is always tied to a signal-table version.

All regexes are pre-compiled at import time — import of this module IS the
"compile once" step; in the engine it happens once per actor process
(ExtractActor.__init__ imports oracle), satisfying BASELINE.json's
"actor pool holding precompiled regex tables".
"""

from __future__ import annotations

import re

SIGNALS_VERSION = "1.1.0"  # 1.1.0: + A.6 main-content extraction tables

# --------------------------------------------------------------------------
# A.2 Headline (MR-X3)
# --------------------------------------------------------------------------

HEADLINE_TAGS: dict[str, float] = {"h1": 3.0, "h2": 2.0, "h3": 1.0, "h4": 1.0}

HEADLINE_CLASSID = re.compile(
    r"(headline|head-line|title|story.?head|article.?head|entry-title|post-title)",
    re.IGNORECASE,
)

HEADLINE_CLASSID_BONUS = 2.0
TITLE_OVERLAP_WEIGHT = 3.0
SLUG_BONUS = 1.0          # if >=2 slug words appear in the candidate text
LINK_DENSITY_WEIGHT = 2.0  # penalty multiplier
LENGTH_PENALTY = 2.0       # if len < 8 or len > 200
HEADLINE_MIN_LEN = 8
HEADLINE_MAX_LEN = 200
HEADLINE_MIN_SCORE = 0.0   # winner must score strictly greater than this

# <title> site-suffix separators (A.2): split on these, keep the longest part.
TITLE_SPLIT = re.compile(r"\||—|–|\s-\s|::")

# --------------------------------------------------------------------------
# A.3 Pubdate (MR-X6)
# --------------------------------------------------------------------------

# meta name/property values (lowercased exact match)
PUBDATE_META_NAMES = frozenset(
    {
        "article:published_time",
        "og:article:published_time",
        "datepublished",
        "dc.date.issued",
        "dcterms.created",
        "date",
        "pubdate",
        "publish-date",
        "publication_date",
        "sailthru.date",
        "originalpublicationdate",
        "article.published",
    }
)

URL_DATE = re.compile(r"/((?:19|20)\d{2})/(\d{1,2})/(\d{1,2})/")

DATE_CLASSID = re.compile(
    r"(date|time|timestamp|byline|dateline|published|posted|updated|fecha)",
    re.IGNORECASE,
)

# family scores (A.3); larger = higher priority family
SCORE_META = 6.0
SCORE_URL = 5.0
SCORE_TIME_TAG = 4.0
SCORE_TIME_PUBDATE_ATTR_BONUS = 1.0
SCORE_HATOM_PUBLISHED = 4.0
SCORE_HATOM_UPDATED = 3.0
SCORE_DATE_CLASSID = 2.0
SCORE_HAS_TIME_BONUS = 1.0

PUBDATE_SANITY_MIN = (1990, 1, 1)
PUBDATE_SANITY_SLACK_DAYS = 2  # candidate must be <= warc_ts + 2 days

# Candidate text longer than this cannot be a date string — discarded before
# parsing (normative pin; keeps the parser off article bodies).
PUBDATE_MAX_TEXT_LEN = 256

# --------------------------------------------------------------------------
# A.4 Authors (MR-X8)
# --------------------------------------------------------------------------

AUTHOR_CLASSID = re.compile(
    r"(byline|by-line|by_line|author|writer|credits|submitted|posted-by)",
    re.IGNORECASE,
)

BY_PREFIX = re.compile(r"^\s*by\b", re.IGNORECASE)
BY_STRIP = re.compile(r"^\s*by\b[:\s]*", re.IGNORECASE)

AUTHOR_STOP_SUBSTRINGS = (
    "comment",
    "posted in",
    "filed",
    "tags",
    "share",
    "updated",
    "min read",
)

ROLE_WORDS = frozenset({"editor", "correspondent", "reporter", "staff"})

AUTHOR_SPLIT = re.compile(r",|\band\b|&|\|", re.IGNORECASE)

# a "capitalized word": token starting with an uppercase letter
CAP_WORD = re.compile(r"\b[A-Z]\w*")

AUTHOR_CLASSID_BONUS = 2.0
AUTHOR_REL_BONUS = 2.0
AUTHOR_HCARD_BONUS = 2.0
AUTHOR_BY_PREFIX_BONUS = 1.0
AUTHOR_CAPWORDS_BONUS = 1.0   # if >=2 capitalized words
AUTHOR_STOPWORD_PENALTY = 2.0
AUTHOR_PROXIMITY_BONUS = 1.0  # within 3 undirected DOM hops of headline winner
AUTHOR_PROXIMITY_HOPS = 3
AUTHOR_MIN_SCORE = 1.0        # winner must score >= this, else authors = []

# Byline candidates sourced from a bare "by"-prefix text match must be short
# (normative pin; whole-article divs are not bylines).
AUTHOR_MAX_TEXT_LEN = 150

# --------------------------------------------------------------------------
# A.6 Main content / boilerplate strip (MR-X11)
# --------------------------------------------------------------------------

# Text-unit tags: block-level elements whose rendered text forms one output
# line. A block nested inside another block (p in blockquote, li in li) is
# NOT a unit — the outermost block is.
CONTENT_BLOCK_TAGS = frozenset({"p", "li", "blockquote", "pre", "h2", "h3", "h4"})

# Container tags: candidates for "the main content element".
CONTENT_CONTAINER_TAGS = frozenset({"article", "main", "section", "div", "body", "td"})

# Unit acceptance (the per-block boilerplate filter).
CONTENT_MIN_UNIT_CHARS = 25       # rendered text shorter than this is chrome
CONTENT_MAX_LINK_DENSITY = 0.5    # link-dominated blocks are navigation

# Container class/id modifiers (readability-style, public knowledge).
CONTENT_POSITIVE = re.compile(
    r"(article|body|content|entry|main|page|post|text|blog|story)", re.IGNORECASE
)
CONTENT_NEGATIVE = re.compile(
    r"(combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta"
    r"|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping"
    r"|tags|tool|widget|nav|menu|social|share|ad-)",
    re.IGNORECASE,
)
CONTENT_POSITIVE_FACTOR = 2.0
CONTENT_NEGATIVE_FACTOR = 0.25

# Ancestor-chain credit: the nearest container gets the unit's full length,
# the next gets 1/2, then 1/4; deeper ancestors get nothing.
CONTENT_CHAIN_WEIGHTS = (1.0, 0.5, 0.25)

# Winner must accumulate at least one minimal unit's worth of score.
CONTENT_MIN_SCORE = float(CONTENT_MIN_UNIT_CHARS)

# --------------------------------------------------------------------------
# Document-level limits (MR-X0)
# --------------------------------------------------------------------------

MAX_HTML_BYTES = 2 * 1024 * 1024  # oversize rows → empty output + metric flag
