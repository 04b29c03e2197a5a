"""Publication-date extraction (MR-X6) — normative spec SURVEY.md A.3.

Candidate families, in priority order (base score in parentheses):
  1. (+6) <meta> whose ``name``/``property`` (lowercased) is in
     PUBDATE_META_NAMES → the ``content`` attribute.
  2. (+5) url path ``/YYYY/M/D/`` → date-only candidate, built directly.
  3. (+4) <time> — ``datetime`` attribute if present else rendered text;
     +1 extra if a ``pubdate`` attribute is present.
  4. hAtom — element whose class TOKEN list contains ``published`` (+4) or
     ``updated`` (+3); for <abbr> the ``title`` attribute is the candidate
     string when present, else rendered text.
  5. (+2) element whose class/id matches DATE_CLASSID (substring, ci) →
     rendered text.

Every candidate string is parsed by MR-X7 (``parse_fuzzy_date``); unparseable
candidates are discarded; text candidates longer than PUBDATE_MAX_TEXT_LEN are
discarded before parsing (pinned). +1 bonus when a time-of-day is present.
Sanity window: 1990-01-01 ≤ d ≤ warc_ts + 2 days (upper bound only when a
warc_ts is supplied). Winner: max score; ties → higher-priority family, then
document order (candidate enumeration order). Rendering per A.5.
"""

from __future__ import annotations

import datetime as _dt

from oracle import signals
from oracle.dom import Node, doc_nodes
from oracle.fuzzydate import FuzzyDate, parse_fuzzy_date
from oracle.textnorm import render_text

_SANITY_MIN = _dt.datetime(*signals.PUBDATE_SANITY_MIN)


def url_path_date(url: str) -> FuzzyDate | None:
    """``/YYYY/M/D/`` in the url path → date-only FuzzyDate (MR-X10 part)."""
    m = signals.URL_DATE.search(url)
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    try:
        _dt.date(y, mo, d)
    except ValueError:
        return None
    return FuzzyDate(y, mo, d)


def extract_pubdate(root: Node, url: str, warc_ts: _dt.datetime | None) -> str:
    """Canonical ISO rendering of the winning pubdate, or ``""``."""
    # (base_score, family_rank, seq, parsed_or_text)
    candidates: list[tuple[float, int, int, FuzzyDate | None, str | None]] = []
    seq = 0

    u = url_path_date(url)
    if u is not None:
        candidates.append((signals.SCORE_URL, 2, -1, u, None))

    for n in doc_nodes(root):
        if n.tag == "meta":
            key = (n.get("name") or n.get("property")).lower()
            if key in signals.PUBDATE_META_NAMES:
                content = n.get("content")
                if content:
                    candidates.append((signals.SCORE_META, 1, seq, None, content))
                    seq += 1
            continue
        if n.tag == "time":
            s = n.get("datetime") or render_text(n)
            if s:
                score = signals.SCORE_TIME_TAG
                if "pubdate" in n.attrs:
                    score += signals.SCORE_TIME_PUBDATE_ATTR_BONUS
                candidates.append((score, 3, seq, None, s))
                seq += 1
        cls = n.classes
        if cls:
            hatom = None
            if "published" in cls:
                hatom = signals.SCORE_HATOM_PUBLISHED
            elif "updated" in cls:
                hatom = signals.SCORE_HATOM_UPDATED
            if hatom is not None:
                if n.tag == "abbr" and n.get("title"):
                    s = n.get("title")
                else:
                    s = render_text(n)
                if s:
                    candidates.append((hatom, 4, seq, None, s))
                    seq += 1
        classid = n.class_id
        if classid and signals.DATE_CLASSID.search(classid) and n.tag != "time":
            s = render_text(n)
            if s:
                candidates.append((signals.SCORE_DATE_CLASSID, 5, seq, None, s))
                seq += 1

    sanity_max = None
    if warc_ts is not None:
        sanity_max = warc_ts + _dt.timedelta(days=signals.PUBDATE_SANITY_SLACK_DAYS)

    best_key: tuple[float, int, int] | None = None
    best: FuzzyDate | None = None
    for base, family, s_eq, parsed, raw in candidates:
        if parsed is None:
            if raw is None or len(raw) > signals.PUBDATE_MAX_TEXT_LEN:
                continue
            parsed = parse_fuzzy_date(raw)
            if parsed is None:
                continue
        dt = parsed.to_datetime()
        if dt < _SANITY_MIN:
            continue
        if sanity_max is not None and dt > sanity_max:
            continue
        score = base + (signals.SCORE_HAS_TIME_BONUS if parsed.has_time else 0.0)
        key = (score, -family, -s_eq)  # max score, then lower family, then earlier
        if best_key is None or key > best_key:
            best_key = key
            best = parsed

    return best.render() if best is not None else ""
