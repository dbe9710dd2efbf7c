"""Property tests for the paren/quote/comment-aware SQL scanner — the
round-4 ADVICE fixes (double-quoted identifiers, -- and /* */ comments,
quote-aware EXCLUDE rewrite, top-level WHERE splitting) hold for
GENERATED statements, not just the hand-picked regression cases."""

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_wasm_spark.dialect import (
    _EXCLUDE_RE,
    _find_top_level_kw,
    _split_top_level,
    _split_where_tail,
    _sub_outside_quotes,
)

# segments that must HIDE a keyword from the scanner
_hidden = st.one_of(
    st.from_regex(r"'[a-z ]{0,10}where[a-z ]{0,10}'", fullmatch=True),
    st.from_regex(r'"[a-z ]{0,10}where[a-z ]{0,10}"', fullmatch=True),
    st.from_regex(r"-- [a-z ]{0,10}where[a-z ]{0,10}\n", fullmatch=True),
    st.from_regex(r"/\* [a-z ]{0,8}where[a-z ]{0,8} \*/", fullmatch=True),
    st.from_regex(r"\(select 1 where [a-z]{1,8} = 2\)", fullmatch=True),
)
_plain = st.from_regex(r"[a-z]{1,8} = [0-9]{1,4}", fullmatch=True)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(_hidden, _plain), min_size=0, max_size=5))
def test_hidden_keywords_never_found(segments):
    sql = "select a, " + ", ".join(segments) if segments else "select a"
    assert _find_top_level_kw(sql, "where") is None


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.one_of(_hidden, _plain), min_size=0, max_size=4),
    st.from_regex(r"[a-z]{1,8} = [0-9]{1,4}", fullmatch=True),
)
def test_top_level_where_found_after_hidden(segments, cond):
    head = "x = 1, " + ", ".join(segments) if segments else "x = 1"
    sql = head + " where " + cond
    body, where = _split_where_tail(sql)
    assert where == cond
    assert body == head.strip()
    # and the SET-list splitter agrees on the body's commas
    parts = _split_top_level(body)
    assert parts[0].strip() == "x = 1"


@settings(max_examples=200, deadline=None)
@given(st.from_regex(r"[a-z ]{0,12}", fullmatch=True))
def test_exclude_rewrite_skips_literals(filler):
    lit = f"'* EXCLUDE ({filler})'"
    sql = f"select * EXCLUDE (a), {lit} as s from t"
    out = _sub_outside_quotes(_EXCLUDE_RE, r"\1EXCEPT\2", sql)
    assert lit in out  # literal untouched
    assert out.startswith("select * EXCEPT (a)")  # real sugar rewritten


# ---- round-4 ADVICE: comment spans must not desync the quote tracker


def test_comment_apostrophe_does_not_desync_exclude_rewrite():
    """An apostrophe inside a -- comment used to open a phantom string
    literal, so the NEXT '* EXCLUDE (' string literal was rewritten
    and real star sugar after it was left alone (round-4 ADVICE)."""
    sql = (
        "select * EXCLUDE (a), -- don't touch\n"
        "'* EXCLUDE (x)' as s, * EXCLUDE (b) from t"
    )
    out = _sub_outside_quotes(_EXCLUDE_RE, r"\1EXCEPT\2", sql)
    assert "'* EXCLUDE (x)'" in out  # literal untouched
    assert out.count("EXCEPT") == 2  # both real sugars rewritten
    assert "-- don't touch" in out  # comment passed through verbatim


def test_block_comment_apostrophe_does_not_desync():
    sql = "select /* can't */ '* EXCLUDE (y)' as s, * EXCLUDE (c) from t"
    out = _sub_outside_quotes(_EXCLUDE_RE, r"\1EXCEPT\2", sql)
    assert "'* EXCLUDE (y)'" in out
    assert out.count("EXCEPT") == 1


@settings(max_examples=200, deadline=None)
@given(
    st.from_regex(r"-- [a-z ]{0,6}'[a-z ]{0,6}\n", fullmatch=True),
    st.from_regex(r"/\* [a-z]{0,4}'[a-z]{0,4} \*/", fullmatch=True),
)
def test_comment_quotes_never_shift_spans(line_c, block_c):
    lit = "'* EXCLUDE (z)'"
    sql = f"select {line_c} {lit} as s, {block_c} * EXCLUDE (d) from t"
    out = _sub_outside_quotes(_EXCLUDE_RE, r"\1EXCEPT\2", sql)
    assert lit in out
    assert out.count("EXCEPT") == 1


# ---- round-5 ADVICE: DuckDB block comments NEST


def test_nested_block_comment_fully_protected():
    """'/* a /* b */ tail */' is ONE comment in DuckDB; a first-*/
    regex would end the span early and expose 'tail' — including any
    star sugar or quotes inside it — to the rewriters (round-5
    ADVICE). The depth-counting scanner must protect the whole span."""
    sql = (
        "select /* outer /* inner */ * EXCLUDE (ghost) ' */ "
        "* EXCLUDE (a) from t"
    )
    out = _sub_outside_quotes(_EXCLUDE_RE, r"\1EXCEPT\2", sql)
    assert "* EXCLUDE (ghost)" in out  # inside the outer comment tail
    assert out.count("EXCEPT") == 1  # only the real sugar rewritten


def test_unterminated_spans_extend_to_eos():
    """Unterminated literals/comments must swallow the rest of the
    string (the engine reports the real syntax error downstream),
    never raise or expose the tail to rewrites."""
    for sql in (
        "select 1 /* open /* deeper */ still-open * EXCLUDE (x)",
        "select 1 -- trailing * EXCLUDE (x)",
        "select '* EXCLUDE (x)",
        'select "* EXCLUDE (x)',
    ):
        out = _sub_outside_quotes(_EXCLUDE_RE, r"\1EXCEPT\2", sql)
        assert "EXCLUDE" in out and "EXCEPT" not in out
