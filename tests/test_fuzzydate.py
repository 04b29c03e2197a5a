"""MR-X7 unit tests — table-driven over SURVEY.md A.5."""

import pytest

from oracle.fuzzydate import FuzzyDate, parse_fuzzy_date


def r(s):
    p = parse_fuzzy_date(s)
    return p.render() if p is not None else None


CASES = [
    # ISO-8601
    ("2021-03-04", "2021-03-04"),
    ("2021-03-04T10:30", "2021-03-04T10:30:00"),
    ("2021-03-04T10:30:05", "2021-03-04T10:30:05"),
    ("2021-03-04T10:30:05Z", "2021-03-04T10:30:05+00:00"),
    ("2021-03-04T10:30:05+05:30", "2021-03-04T10:30:05+05:30"),
    ("2021-03-04T10:30:05-0800", "2021-03-04T10:30:05-08:00"),
    ("2021-03-04 10:30", "2021-03-04T10:30:00"),
    ("x 2021-03-04T10:30Z y", "2021-03-04T10:30:00+00:00"),
    # D Month YYYY
    ("1st January 2010", "2010-01-01"),
    ("22nd   March 1999", "1999-03-22"),
    ("3 Sep 2015", "2015-09-03"),
    ("3 Sept 2015", "2015-09-03"),
    ("3rd of June 2012", "2012-06-03"),
    ("Wednesday 15 August 2018", "2018-08-15"),
    # Month D, YYYY
    ("January 1, 2010", "2010-01-01"),
    ("Jan 1 2010", "2010-01-01"),
    ("March 4th, 2021", "2021-03-04"),
    ("Dec. 25, 2020", "2020-12-25"),
    # D/M/YYYY day-first
    ("4/3/2021", "2021-03-04"),
    ("04-03-2021", "2021-03-04"),
    ("4.3.2021", "2021-03-04"),
    ("25/12/2020", "2020-12-25"),
    ("12/25/2020", None),  # day-first only: month 25 invalid, no US fallback
    # D/M/YY pivot
    ("4/3/21", "2021-03-04"),
    ("4/3/99", "1999-03-04"),
    ("4/3/49", "2049-03-04"),
    ("4/3/50", "1950-03-04"),
    # times attached to non-ISO dates
    ("4/3/2021 10:45", "2021-03-04T10:45:00"),
    ("10:45 4/3/2021", "2021-03-04T10:45:00"),
    ("4 March 2021 10.45pm", "2021-03-04T22:45:00"),
    ("4 March 2021 12:00am", "2021-03-04T00:00:00"),
    ("4 March 2021 12:15pm", "2021-03-04T12:15:00"),
    ("4 March 2021, 9:05:07 am PST", "2021-03-04T09:05:07-08:00"),
    ("Monday 4.3.2021 10.45pm GMT", "2021-03-04T22:45:00+00:00"),
    ("4 March 2021 1:30 pm BST", "2021-03-04T13:30:00+01:00",),
    # the date span must not donate a fake time
    ("1.2.2010", "2010-02-01"),
    ("4.3.2021 no time", "2021-03-04"),
    # junk / invalid
    ("", None),
    ("no date here", None),
    ("13/13/2021", None),
    ("2021-02-29", None),
    ("31/2/2010 then 1/2/2010", "2010-02-01"),  # first VALID match of the format
    ("0/0/2020", None),
    ("99999", None),
    # format priority: ISO beats textual even if later in string
    ("1st January 2010 or 2011-02-03", "2011-02-03"),
    # never invent a midnight
    ("March 4, 2021", "2021-03-04"),
]


@pytest.mark.parametrize("s,expected", CASES)
def test_parse_render(s, expected):
    assert r(s) == expected


def test_invalid_time_hour():
    # broken time on a valid textual date → date-only
    assert r("4 March 2021 25:99") == "2021-03-04"


def test_ampm_hour_range():
    # "13:30pm": hour 13 with am/pm is invalid → the time is discarded
    # entirely (pinned) → date-only.
    assert r("4 March 2021 13:30pm") == "2021-03-04"


def test_render_dataclass_direct():
    assert FuzzyDate(2020, 1, 2).render() == "2020-01-02"
    assert FuzzyDate(2020, 1, 2, 3, 4, 5, True, None).render() == "2020-01-02T03:04:05"
    assert FuzzyDate(2020, 1, 2, 3, 4, 5, True, -330).render() == "2020-01-02T03:04:05-05:30"
