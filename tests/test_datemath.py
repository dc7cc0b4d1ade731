"""Date-math parser (solr/util/DateMathParser.java grammar)."""

from datetime import datetime

import pytest

from lucene_solr_spark.functions.datemath import parse_date_math

NOW = datetime(2024, 3, 15, 13, 45, 30, 123456)


def test_rounding():
    assert parse_date_math("NOW/DAY", NOW) == datetime(2024, 3, 15)
    assert parse_date_math("NOW/MONTH", NOW) == datetime(2024, 3, 1)
    assert parse_date_math("NOW/YEAR", NOW) == datetime(2024, 1, 1)
    assert parse_date_math("NOW/HOUR", NOW) == datetime(2024, 3, 15, 13)
    assert parse_date_math("NOW/SECOND", NOW) == datetime(2024, 3, 15, 13, 45, 30)


def test_add_sub():
    assert parse_date_math("NOW/DAY+6MONTHS", NOW) == datetime(2024, 9, 15)
    assert parse_date_math("NOW/DAY-7DAYS", NOW) == datetime(2024, 3, 8)
    assert parse_date_math("NOW/DAY+1YEAR-1DAY", NOW) == datetime(2025, 3, 14)
    assert parse_date_math("NOW+2HOURS/HOUR", NOW) == datetime(2024, 3, 15, 15)


def test_month_clamp():
    base = datetime(2024, 1, 31)
    assert parse_date_math("NOW+1MONTH", base) == datetime(2024, 2, 29)  # leap
    assert parse_date_math("NOW+13MONTHS", base) == datetime(2025, 2, 28)


def test_iso_base():
    assert parse_date_math("2024-01-03T07:09:00Z/DAY+2MONTHS-45DAYS") == \
        datetime(2024, 1, 18)
    assert parse_date_math("2024-06-01T00:00:00Z+90MINUTES") == \
        datetime(2024, 6, 1, 1, 30)


def test_errors():
    with pytest.raises(ValueError):
        parse_date_math("NOW/3DAYS")
    with pytest.raises(ValueError):
        parse_date_math("NOW+DAYS")
    with pytest.raises(ValueError):
        parse_date_math("SOON/DAY")


def test_suite_entry_registered():
    from lucene_solr_spark.relational.suite import ORACLES, QUERIES

    assert "time_series" in QUERIES
    assert "time_series" in ORACLES


class TestTimezone:
    """TZ param (DateMathParser.java:364-420: ops run on the zone's
    wall clock; rounding lands on the zone's midnight)."""

    def test_round_day_in_zone(self):
        from datetime import datetime

        from lucene_solr_spark.functions.datemath import parse_date_math

        now = datetime(2024, 6, 15, 2, 30)          # 02:30 UTC
        # in New York (UTC-4, EDT) that's June 14 22:30 → /DAY = June 14
        # 00:00 EDT = June 14 04:00 UTC
        got = parse_date_math("NOW/DAY", now=now, tz="America/New_York")
        assert got == datetime(2024, 6, 14, 4, 0)
        # UTC default rounds to June 15 00:00
        assert parse_date_math("NOW/DAY", now=now) == datetime(2024, 6, 15)

    def test_add_day_across_dst_keeps_wall_time(self):
        from datetime import datetime

        from lucene_solr_spark.functions.datemath import parse_date_math

        # 2024-03-09 12:00 EST (UTC-5) = 17:00 UTC; +1DAY (wall) =
        # 2024-03-10 12:00 EDT (UTC-4) = 16:00 UTC — 23 real hours
        now = datetime(2024, 3, 9, 17, 0)
        got = parse_date_math("NOW+1DAY", now=now, tz="America/New_York")
        assert got == datetime(2024, 3, 10, 16, 0)
        # UTC math adds 24 absolute hours
        assert parse_date_math("NOW+1DAY", now=now) == datetime(2024, 3, 10, 17)

    def test_month_round_in_zone(self):
        from datetime import datetime

        from lucene_solr_spark.functions.datemath import parse_date_math

        # 00:30 UTC July 1 is still June 30 in Los Angeles → /MONTH
        # = June 1 00:00 PDT = June 1 07:00 UTC
        now = datetime(2024, 7, 1, 0, 30)
        got = parse_date_math("NOW/MONTH", now=now, tz="America/Los_Angeles")
        assert got == datetime(2024, 6, 1, 7, 0)

    def test_tz_utc_is_noop(self):
        from datetime import datetime

        from lucene_solr_spark.functions.datemath import parse_date_math

        now = datetime(2024, 6, 15, 2, 30)
        assert parse_date_math("NOW/DAY+3HOURS", now=now, tz="UTC") == \
            parse_date_math("NOW/DAY+3HOURS", now=now)
