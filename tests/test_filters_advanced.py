"""JournalFilter advanced semantics.

Parity model: reference JournalFilterAdvancedTests.swift (date fractional
seconds/timezones, boundary inclusivity, invalid date strings, delimiters,
whitespace/case, empty tag arrays, include+exclude combos, missing-key
policy, custom predicate ordering) — the rebuild's DSL must match
JournalFilter.swift:74-124 decisions point for point.
"""

from datetime import date, datetime

from vectorindex_tpu.models.filters import JournalFilter


def test_date_fractional_seconds_and_timezone():
    f = JournalFilter().date_between("2024-01-01", "2024-12-31").compile()
    assert f({"date": "2024-06-15T10:30:00.123456"})
    assert f({"date": "2024-06-15T10:30:00+05:00"})
    assert not f({"date": "2025-01-01T00:00:00.999999"})


def test_date_boundary_inclusive():
    f = JournalFilter().date_between("2024-03-01", "2024-03-31").compile()
    assert f({"date": "2024-03-01"})  # lower bound inclusive
    assert f({"date": "2024-03-31"})  # upper bound inclusive
    assert not f({"date": "2024-02-29"})
    assert not f({"date": "2024-04-01"})


def test_date_accepts_date_and_datetime_objects():
    f = (
        JournalFilter()
        .date_between(date(2024, 1, 1), datetime(2024, 6, 30, 12, 0))
        .compile()
    )
    assert f({"date": "2024-03-15"})
    assert not f({"date": "2024-07-01"})


def test_invalid_date_string_handling():
    """Unparseable dates behave like a missing key (reference: formatter
    returns nil → guard falls through to the missing-key policy)."""
    strict = JournalFilter().date_between("2024-01-01", "2024-12-31").compile()
    assert not strict({"date": "not-a-date"})
    lax = (
        JournalFilter()
        .date_between("2024-01-01", "2024-12-31")
        .allowing_missing_keys()
        .compile()
    )
    assert lax({"date": "not-a-date"})


def test_tags_custom_delimiter():
    f = (
        JournalFilter()
        .set_keys(delimiter=";")
        .including_tags("work")
        .compile()
    )
    assert f({"tags": "work;home"})
    assert not f({"tags": "work,home"})  # comma is literal under ';' delim


def test_tags_whitespace_trimmed():
    f = JournalFilter().including_tags("  alpha ").compile()
    assert f({"tags": " alpha , beta"})
    assert f({"tags": "alpha"})
    assert not f({"tags": "beta"})


def test_tags_case_sensitive():
    f = JournalFilter().including_tags("Work").compile()
    assert f({"tags": "Work"})
    assert not f({"tags": "work"})  # reference: no case folding


def test_include_any_vs_all_semantics():
    """Reference default is ANY-of (requireAll=false, JournalFilter.swift:18)."""
    any_f = JournalFilter().including_tags("a", "b").compile()
    assert any_f({"tags": "a"})
    assert any_f({"tags": "b,c"})
    assert not any_f({"tags": "c"})
    all_f = JournalFilter().including_tags("a", "b", require_all=True).compile()
    assert all_f({"tags": "a,b,c"})
    assert not all_f({"tags": "a"})


def test_including_tags_empty_strings_dropped():
    f = JournalFilter().including_tags("", "  ", "real").compile()
    assert f({"tags": "real"})
    assert not f({"tags": "other"})


def test_include_exclude_combined():
    f = (
        JournalFilter()
        .including_tags("keep")
        .excluding_tags("drop")
        .compile()
    )
    assert f({"tags": "keep"})
    assert not f({"tags": "keep,drop"})  # exclusion wins
    assert not f({"tags": "other"})


def test_exclude_only_missing_key_policy():
    """Missing tags key under an exclude-only filter: fails unless missing
    keys are allowed (reference guard, JournalFilter.swift:104)."""
    strict = JournalFilter().excluding_tags("x").compile()
    assert not strict({"other": "1"})
    lax = JournalFilter().excluding_tags("x").allowing_missing_keys().compile()
    assert lax({"other": "1"})
    assert not lax({"tags": "x"})


def test_list_valued_tags_metadata():
    f = JournalFilter().including_tags("a").compile()
    assert f({"tags": ["a", "b"]})
    assert not f({"tags": ["b"]})


def test_custom_predicate_order_and_rejection():
    calls = []

    def p1(meta):
        calls.append("p1")
        return True

    def p2(meta):
        calls.append("p2")
        return False

    def p3(meta):
        calls.append("p3")
        return True

    f = JournalFilter().and_(p1).and_(p2).and_(p3).compile()
    assert not f({"k": "v"})
    assert calls == ["p1", "p2"]  # AND short-circuits in insertion order


def test_nil_metadata_policy():
    """None metadata == every key missing (reference build(): guard meta)."""
    assert JournalFilter().compile()(None)
    assert not JournalFilter().including_tags("t").compile()(None)
    assert JournalFilter().including_tags("t").allowing_missing_keys().compile()(None)
    assert not (
        JournalFilter().date_between("2024-01-01", "2024-02-01").compile()(None)
    )


def test_custom_keys():
    f = (
        JournalFilter()
        .set_keys(date_key="created", tags_key="labels")
        .date_between("2024-01-01", "2024-12-31")
        .including_tags("x")
        .compile()
    )
    assert f({"created": "2024-05-05", "labels": "x,y"})
    assert not f({"date": "2024-05-05", "tags": "x"})  # wrong keys


def test_combined_date_and_tags():
    f = (
        JournalFilter()
        .date_between("2024-01-01", "2024-12-31")
        .including_tags("log")
        .compile()
    )
    assert f({"date": "2024-06-01", "tags": "log"})
    assert not f({"date": "2023-06-01", "tags": "log"})
    assert not f({"date": "2024-06-01", "tags": "other"})
