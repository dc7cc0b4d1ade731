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
