"""Fuzzy multi-format date/time parsing + canonical rendering (MR-X7, A.5).

Normative behavior (pinned — SURVEY.md Appendix A.5):

Format priority (the first FORMAT that matches anywhere in the string wins;
within one format, the leftmost valid calendar date wins):
  1. ISO-8601   ``YYYY-MM-DD[{T| }HH:MM[:SS][Z|±hh[:]mm]]``
  2. ``D{1,2}(st|nd|rd|th)? Month YYYY``
  3. ``Month D{1,2}(st|nd|rd|th)?,? YYYY``
  4. ``D/M/YYYY`` · ``D-M-YYYY`` · ``D.M.YYYY``   (day-first, UK bias; no US fallback)
  5. ``D/M/YY``  (yy<50 → 20yy else 19yy)

Month names: full + 3-letter abbreviations (``sept`` also accepted), case-
insensitive. Leading day-names are tolerated implicitly (patterns are searched,
not anchored). Ordinal suffixes stripped.

Time-of-day: for non-ISO formats, searched independently anywhere in the
string **with the matched date span blanked out** (so ``1.2.2010`` never
donates a fake "2:20"):
  ``H{1,2}[:.]MM([:.]SS)?  [am|pm]  [GMT|BST|UTC|EST|EDT|PST|PDT]``
Hour 1–12 with am/pm (12am→00, 12pm→12), else 0–23. Invalid time → no time.

Timezone abbrev → fixed offsets (pinned): GMT/UTC +00:00 · BST +01:00 ·
EST −05:00 · EDT −04:00 · PST −08:00 · PDT −07:00.

Rendering: date-only → ``YYYY-MM-DD``; with time → ``YYYY-MM-DDTHH:MM:SS``
(seconds rendered as ``00`` when absent) plus ``±hh:mm`` only when a timezone
was explicit in the source (``Z`` → ``+00:00``). A missing time-of-day is
NEVER rendered as 00:00:00.
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass

_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

_MONTH_RE = (
    r"(jan(?:uary)?|feb(?:ruary)?|mar(?:ch)?|apr(?:il)?|may|jun(?:e)?|"
    r"jul(?:y)?|aug(?:ust)?|sep(?:t(?:ember)?)?|oct(?:ober)?|nov(?:ember)?|"
    r"dec(?:ember)?)"
)

_ORD = r"(?:st|nd|rd|th)?"

RE_ISO = re.compile(
    r"(?<!\d)(\d{4})-(\d{2})-(\d{2})"
    r"(?:[T ](\d{2}):(\d{2})(?::(\d{2}))?(Z|[+-]\d{2}:?\d{2})?)?",
)
RE_DMY_NAME = re.compile(
    r"(?<!\d)(\d{1,2})" + _ORD + r"\s+(?:of\s+)?" + _MONTH_RE + r"\.?,?\s+(\d{4})(?!\d)",
    re.IGNORECASE,
)
RE_MDY_NAME = re.compile(
    _MONTH_RE + r"\.?\s+(\d{1,2})" + _ORD + r"\s*,?\s+(\d{4})(?!\d)",
    re.IGNORECASE,
)
RE_DMY4 = re.compile(r"(?<!\d)(\d{1,2})([/\-.])(\d{1,2})\2(\d{4})(?!\d)")
RE_DMY2 = re.compile(r"(?<!\d)(\d{1,2})([/\-.])(\d{1,2})\2(\d{2})(?!\d)")

RE_TIME = re.compile(
    r"(?<![\d:.])(\d{1,2})[:.](\d{2})(?:[:.](\d{2}))?"
    r"\s*(am|pm)?\s*\b(GMT|BST|UTC|EST|EDT|PST|PDT)?\b",
    re.IGNORECASE,
)

TZ_OFFSETS_MIN = {
    "GMT": 0, "UTC": 0, "BST": 60,
    "EST": -300, "EDT": -240, "PST": -480, "PDT": -420,
}


@dataclass(frozen=True)
class FuzzyDate:
    year: int
    month: int
    day: int
    hour: int = 0
    minute: int = 0
    second: int = 0
    has_time: bool = False
    tz_minutes: int | None = None  # None = no explicit timezone

    def render(self) -> str:
        """Canonical byte-normative ISO rendering (A.5)."""
        s = f"{self.year:04d}-{self.month:02d}-{self.day:02d}"
        if not self.has_time:
            return s
        s += f"T{self.hour:02d}:{self.minute:02d}:{self.second:02d}"
        if self.tz_minutes is not None:
            sign = "+" if self.tz_minutes >= 0 else "-"
            off = abs(self.tz_minutes)
            s += f"{sign}{off // 60:02d}:{off % 60:02d}"
        return s

    def to_datetime(self) -> _dt.datetime:
        """Naive datetime on local components (sanity-window comparisons)."""
        return _dt.datetime(
            self.year, self.month, self.day, self.hour, self.minute, self.second
        )


def _valid_date(y: int, m: int, d: int) -> bool:
    try:
        _dt.date(y, m, d)
        return True
    except ValueError:
        return False


def _parse_time_fields(h: str, mi: str, sec: str | None, ampm: str | None, tz: str | None):
    hour, minute = int(h), int(mi)
    second = int(sec) if sec else 0
    if ampm:
        if not (1 <= hour <= 12):
            return None
        ampm = ampm.lower()
        if ampm == "am":
            hour = 0 if hour == 12 else hour
        else:
            hour = 12 if hour == 12 else hour + 12
    if not (0 <= hour <= 23 and 0 <= minute <= 59 and 0 <= second <= 59):
        return None
    tz_min = TZ_OFFSETS_MIN[tz.upper()] if tz else None
    return hour, minute, second, tz_min


def _search_time(s: str):
    for m in RE_TIME.finditer(s):
        fields = _parse_time_fields(m.group(1), m.group(2), m.group(3), m.group(4), m.group(5))
        if fields is not None:
            return fields
    return None


def parse_fuzzy_date(s: str) -> FuzzyDate | None:
    """Parse the first recognizable date (and optional time) in ``s``."""
    if not s:
        return None

    # 1. ISO-8601 — time is part of the same match
    for m in RE_ISO.finditer(s):
        y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if not _valid_date(y, mo, d):
            continue
        if m.group(4) is not None:
            hh, mm = int(m.group(4)), int(m.group(5))
            ss = int(m.group(6)) if m.group(6) else 0
            if not (hh <= 23 and mm <= 59 and ss <= 59):
                # valid date, broken time → date-only (pinned)
                return FuzzyDate(y, mo, d)
            tzs = m.group(7)
            tz_min: int | None = None
            if tzs:
                if tzs == "Z":
                    tz_min = 0
                else:
                    sign = 1 if tzs[0] == "+" else -1
                    digits = tzs[1:].replace(":", "")
                    tz_min = sign * (int(digits[:2]) * 60 + int(digits[2:4]))
            return FuzzyDate(y, mo, d, hh, mm, ss, True, tz_min)
        return FuzzyDate(y, mo, d)

    # 2–5: date span, then independent time search on the blanked string
    def finish(y: int, mo: int, d: int, span: tuple[int, int]) -> FuzzyDate:
        blanked = s[: span[0]] + (" " * (span[1] - span[0])) + s[span[1]:]
        t = _search_time(blanked)
        if t is None:
            return FuzzyDate(y, mo, d)
        hh, mm, ss, tz_min = t
        return FuzzyDate(y, mo, d, hh, mm, ss, True, tz_min)

    for m in RE_DMY_NAME.finditer(s):
        d, mo, y = int(m.group(1)), _MONTHS[m.group(2)[:3].lower()], int(m.group(3))
        if _valid_date(y, mo, d):
            return finish(y, mo, d, m.span())
    for m in RE_MDY_NAME.finditer(s):
        mo, d, y = _MONTHS[m.group(1)[:3].lower()], int(m.group(2)), int(m.group(3))
        if _valid_date(y, mo, d):
            return finish(y, mo, d, m.span())
    for m in RE_DMY4.finditer(s):
        d, mo, y = int(m.group(1)), int(m.group(3)), int(m.group(4))
        if _valid_date(y, mo, d):
            return finish(y, mo, d, m.span())
    for m in RE_DMY2.finditer(s):
        d, mo, yy = int(m.group(1)), int(m.group(3)), int(m.group(4))
        y = 2000 + yy if yy < 50 else 1900 + yy
        if _valid_date(y, mo, d):
            return finish(y, mo, d, m.span())
    return None
