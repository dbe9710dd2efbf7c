"""Hypothesis property tests for the pure-Python surfaces (tokenizer,
JSON inference) — golden tests pin specific reference behaviors;
these pin the INVARIANTS that must hold on arbitrary input, the class
of bug goldens cannot catch (crashes / non-monotone offsets / lattice
asymmetry on inputs nobody wrote down)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_wasm_spark import tokenizer
from duckdb_wasm_spark.sources import json_analyzer as ja


# --------------------------------------------------------- tokenizer
@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_tokenize_never_crashes_and_offsets_are_strictly_increasing(text):
    out = tokenizer.tokenize(text)
    offs, types = out["offsets"], out["types"]
    assert len(offs) == len(types)
    assert all(b > a for a, b in zip(offs, offs[1:]))
    assert all(0 <= o < max(len(text), 1) for o in offs)
    # every token starts on a non-whitespace character
    assert all(text[o] not in " \t\r\n" for o in offs)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["select", "from", "x", "'a''b'", '"Q id"', "1.5e-3", "*",
             "--c", "/*m*/", "(", ")", ";", "?", "42"]
        ),
        max_size=12,
    )
)
def test_tokenize_token_count_is_whitespace_invariant(parts):
    """Extra whitespace between tokens must not change the token
    stream's types (offsets shift, classification must not)."""
    tight = " ".join(parts)
    loose = "   \t ".join(parts) + "  \n"
    # line comments swallow everything to EOL — only compare when no
    # line comment can eat a following token
    if any(p == "--c" for p in parts[:-1]):
        return
    assert (
        tokenizer.tokenize(tight)["types"]
        == tokenizer.tokenize(loose)["types"]
    )


# ------------------------------------------------------ JSON analyzer
_SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=12),
)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["a", "b", "c"]), _SCALARS, max_size=3
        ),
        min_size=1,
        max_size=12,
    )
)
def test_analyze_json_never_crashes_on_row_arrays(rows):
    t = ja.analyze_json(json.dumps(rows))
    assert t.shape is ja.Shape.ROW_ARRAY
    # every key that appears anywhere must be typed
    seen = {k for r in rows for k in r}
    got = {name for name, _ in t.type.fields}
    assert seen <= got
    # field names are emitted sorted (the analyzer's documented order)
    names = [n for n, _ in t.type.fields]
    assert names == sorted(names)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        min_size=1,
        max_size=20,
    )
)
def test_analyze_json_integer_columns_infer_integer(vals):
    t = ja.analyze_json(json.dumps([{"v": v} for v in vals]))
    (name, typ), = [c for c in t.type.fields if c[0] == "v"]
    assert typ.kind in ("int32", "uint32", "int64", "uint64"), typ.kind


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["a", "b"]), _SCALARS, max_size=2
        ),
        min_size=2,
        max_size=10,
    )
)
def test_analyze_json_row_order_does_not_change_column_set(rows):
    """Inference is a fold over row samples — the COLUMN SET and each
    column's nullability class must not depend on row order (the
    median-type pick may, the set must not)."""
    a = ja.analyze_json(json.dumps(rows))
    b = ja.analyze_json(json.dumps(list(reversed(rows))))
    an = {n for n, _ in (a.type.fields if a.type else [])}
    bn = {n for n, _ in (b.type.fields if b.type else [])}
    assert an == bn


# ------------------------------------------------------------ dialect
from duckdb_wasm_spark import dialect  # noqa: E402


_SNIPPETS = st.lists(
    st.sampled_from(
        [
            "select x::INTEGER from t",
            "select substring(s from 2 for 3) from t",
            "select * from generate_series(0, 9) g(v)",
            "select * EXCLUDE (a) from t",
            "select strftime(d, '%Y-%m-%d') from t",
            "select 'a::b' from t",          # cast syntax inside a literal
            "select '* EXCLUDE (x)' from t",  # rewrite keyword in a literal
            "select substring('a from b' from 2) from t",  # r10 ADVICE
            "select 'it''s'::text from t",   # doubled-quote cast operand
            "select 1",
        ]
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=200, deadline=None)
@given(_SNIPPETS)
def test_dialect_rewrite_is_idempotent(parts):
    """Rewrites must not re-fire on their own output: translating a
    translated text is the identity (a second pass that changed
    anything would mean the rewrite's output re-matches its own
    pattern — the classic double-rewrite corruption class)."""
    sql = " union all ".join(parts)
    once, _ = dialect._rewrite_query_text(sql)
    twice, _ = dialect._rewrite_query_text(once)
    assert twice == once


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abfromrsting:*()' ECXLUDE%", max_size=40))
def test_dialect_rewrite_preserves_string_literals(body):
    """Whatever surrounds it, a complete single-quoted literal's TEXT
    survives translation byte-for-byte (rewrites run outside protected
    spans only). The alphabet can spell 'from'/'for'/'substring' so a
    span-unaware substring rewrite would be caught here (round-10
    ADVICE: the pre-fix rewrite corrupted ' from ' inside literals)."""
    lit = "'" + body.replace("'", "") + "'"
    sql = f"select {lit} as c from t"
    out, _ = dialect._rewrite_query_text(sql)
    assert lit in out


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab from', ", max_size=24))
def test_substring_rewrite_preserves_literal_operands(body):
    """A literal FIRST ARGUMENT of substring(x from n) survives the
    FROM→comma rewrite byte-for-byte even when it contains ' from '
    itself (round-10 ADVICE golden, generalized)."""
    lit = "'" + body.replace("'", "") + "'"
    sql = f"select substring({lit} from 2) as c from t"
    out, _ = dialect._rewrite_query_text(sql)
    assert lit in out
    assert f"substring({lit}, 2)" in out


def test_substring_and_cast_rewrite_goldens():
    """Pinned repros for the two round-10 ADVICE dialect bugs."""
    out, _ = dialect._rewrite_query_text(
        "select substring('a from b' from 2) as c from t")
    assert "substring('a from b', 2)" in out
    out, _ = dialect._rewrite_query_text("select 'it''s'::text as c")
    assert "CAST('it''s' AS STRING)" in out
    out, _ = dialect._rewrite_query_text(
        "select substring('x for y' from 1 for 2) as c")
    assert "substring('x for y', 1, 2)" in out


# ----------------------------------------------------------- typenames
from duckdb_wasm_spark.sources import typenames as tn  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefgihlmnoprstuvz0123456789[](), ", max_size=25))
def test_parse_type_fails_closed(name):
    """Arbitrary type-name text either parses or raises the defined
    TypeNameError — never a stray KeyError/IndexError (the ingestion
    path surfaces this error verbatim to the API caller)."""
    try:
        tn.parse_type(name)
    except tn.TypeNameError:
        pass


# ----------------------------------------------- JSON column-object spans
@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="ab\\\"'", min_size=1, max_size=4),
        st.lists(
            st.integers(-5, 5) | st.text(max_size=4), max_size=3
        ),
        max_size=3,
    )
)
def test_column_spans_are_in_bounds_and_start_on_arrays(obj):
    """_column_spans scans raw bytes with its own string/escape
    tracking — every reported (offset, size) must stay inside the text
    and start on the column's '[' whatever hostile key characters
    (quotes, backslashes) appear."""
    text = json.dumps(obj)
    spans = ja._column_spans(text)
    if spans is None:
        return
    for k, (off, size) in spans.items():
        assert 0 <= off <= len(text) and off + size <= len(text)
        assert text[off:off + size].startswith("[")


# ------------------------------------------------------------ http_range
from duckdb_wasm_spark.sources.http_range import HttpRangeReader  # noqa: E402


class _FakeRange(HttpRangeReader):
    """Transport replaced by a byte slice — pins the chunk/cache/seek
    arithmetic without a server."""

    def __init__(self, data: bytes, chunk: int):
        super().__init__("http://fake/x", chunk=chunk)
        self._data = data

    def _get_range(self, start, end):
        self.request_log.append((start, end))
        if self._size is None:
            self._size = len(self._data)
        return self._data[start:end + 1]


@settings(max_examples=300, deadline=None)
@given(
    st.binary(min_size=1, max_size=200),
    st.integers(1, 32),
    st.integers(0, 250),
    st.integers(-5, 250),
)
def test_http_range_reads_equal_slices(data, chunk, pos, ln):
    f = _FakeRange(data, chunk)
    f.seek(min(pos, len(data)))
    out = f.read(ln)
    start = min(pos, len(data))
    expect = data[start:] if ln < 0 else data[start:start + ln]
    assert out == expect
    f.seek(-1, 2)
    assert f.tell() == len(data) - 1
    assert f.read(1) == data[-1:]
    # chunk-aligned transport: every request stays inside the file and
    # no single request spans more than one chunk block
    for s, e in f.request_log:
        assert 0 <= s <= e < len(data)
        assert e - s + 1 <= chunk


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "select * from t qualify row_number() over (order by x)"
                " <= 2",
                "select a from t where a > 1",
                "select 'qualify' from t",
                "select * from generate_series(0, 9) g(v)",
                "select * from generate_series(0, ?) g(v)",
                "select * from generate_series(10, 0, -2) g(v)",
            ]
        ),
        min_size=1,
        max_size=3,
    )
)
def test_qualify_and_generate_series_rewrites_idempotent(parts):
    sql = " union all ".join(parts)
    o1, _ = dialect._rewrite_query_text(sql)
    o2, _ = dialect._rewrite_query_text(o1)
    assert o1 == o2


# ------------------------------------------ r11: remaining rewrites
# (round-10 verdict #6: UPDATE/DELETE/ALTER/QUALIFY/EXCLUDE and the
# typename parser are the same regex surface class that yielded two
# real bugs in r10 — give each the idempotence / literal-preservation
# / fails-closed treatment)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="strftime%Ymd('), ", max_size=32))
def test_strftime_rewrite_preserves_literals(body):
    """A literal that can spell strftime(...) text survives
    translation byte-for-byte; the rewrite only fires on real
    format-first calls outside literals."""
    lit = "'" + body.replace("'", "") + "'"
    sql = f"select {lit} as c from t"
    out, _ = dialect._rewrite_query_text(sql)
    assert lit in out


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abc_", min_size=1, max_size=6),
    st.sampled_from(["%Y", "%Y-%m", "%Y-%m-%d", "%H:%M:%S", "%d/%m"]),
)
def test_strftime_rewrite_maps_every_directive(col, fmt):
    """Every sqlite directive in the map is translated and no '%'
    survives into the date_format pattern for mapped-only formats."""
    out, _ = dialect._rewrite_query_text(
        f"select strftime('{fmt}', {col}) from t"
    )
    assert "date_format(" in out and "%" not in out
    twice, _ = dialect._rewrite_query_text(out)
    assert twice == out


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="qualify rown()<=3'odrebt ", max_size=40))
def test_qualify_never_crashes_and_preserves_literals(body):
    """Arbitrary QUALIFY-ish text either rewrites or raises the
    defined ValueError — never an IndexError/AttributeError — and a
    complete literal spelling 'qualify'/'order' is never the split
    point."""
    lit = "'" + body.replace("'", "") + "'"
    sql = f"select {lit} as c from t qualify row_number() over (order by c) <= 2"
    try:
        out, _ = dialect._rewrite_query_text(sql)
    except ValueError:
        return
    assert lit in out
    assert "__qualify__" in out


def test_qualify_rejects_distinct_and_handles_tails():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dialect._rewrite_query_text(
            "select distinct a from t qualify row_number() "
            "over (order by a) = 1"
        )
    out, _ = dialect._rewrite_query_text(
        "select a from t qualify row_number() over (order by a) <= 2 "
        "order by a limit 1"
    )
    assert out.rstrip().endswith("order by a limit 1")
    # 'order' inside the OVER parens must not cut the predicate
    assert "over (order by a) <= 2" in out


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="ab=1,  ", min_size=1, max_size=20),
    st.one_of(st.none(), st.text(alphabet="ab<>=1 ", min_size=1, max_size=12)),
    st.sampled_from([
        "",
        " (select x from u where y = 1)",
        " 'a where b'",
        " -- where comment\n",
    ]),
)
def test_split_where_tail_finds_only_top_level_where(body, cond, decoy):
    """_split_where_tail must split at the TOP-LEVEL WHERE only:
    a WHERE inside a subquery's parens, a string literal, or a comment
    (the decoys) never mis-splits; with no top-level WHERE the whole
    tail is the body. (Bodies are quote-balanced by construction — an
    unterminated literal legitimately swallows everything after it.)"""
    body = body.replace("where", "ab") + decoy
    tail = body if cond is None else f"{body} where {cond}"
    got_body, got_cond = dialect._split_where_tail(tail)
    if cond is None:
        assert got_cond is None
        assert got_body == body.strip()
    else:
        assert got_cond == cond.strip()
        assert got_body == body.strip()


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(["orders", 'my."tbl"', "t1"]),
    st.text(alphabet="abcdef_", min_size=1, max_size=8),
    st.text(alphabet="abcdef_", min_size=1, max_size=8),
)
def test_alter_statements_round_trip(table, old, new):
    """The three supported ALTER forms classify with exact metadata;
    arbitrary other actions fail CLOSED as unsupported (never a crash,
    never a silent partial parse)."""
    t = dialect.translate(f"ALTER TABLE {table} RENAME COLUMN {old} TO {new}")
    assert t.kind == "alter" and t.meta["op"] == "rename_column"
    assert t.meta["old"] == old and t.meta["new"] == new
    t = dialect.translate(f"ALTER TABLE {table} DROP COLUMN {old}")
    assert t.kind == "alter" and t.meta["op"] == "drop_column"
    assert t.meta["column"] == old
    t = dialect.translate(f"ALTER TABLE {table} RENAME TO {new}")
    assert t.kind == "alter" and t.meta["op"] == "rename_table"


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdef_() 1", max_size=18))
def test_alter_arbitrary_actions_fail_closed(action):
    try:
        t = dialect.translate(f"ALTER TABLE t {action}")
    except Exception as e:  # noqa: BLE001 — must be a defined error
        assert isinstance(e, ValueError), type(e)
        return
    assert t.kind in ("alter", "unsupported"), t.kind


# valid leaf type names the parser supports — round-trip through the
# SPARK simpleString and back must be a fixpoint
_LEAF_TYPES = st.sampled_from([
    "int8", "int16", "int32", "int64", "float", "double", "bool",
    "utf8", "binary", "date32", "timestamp",
])


@settings(max_examples=200, deadline=None)
@given(st.recursive(
    _LEAF_TYPES.map(lambda s: {"type": s}),
    lambda child: st.one_of(
        st.fixed_dictionaries({"type": st.just("list"),
                               "children": st.lists(child, min_size=1, max_size=1)}),
        st.fixed_dictionaries({"type": st.just("map"),
                               "children": st.lists(child, min_size=2, max_size=2)}),
        st.fixed_dictionaries({"type": st.just("struct"),
                               "children": st.lists(child, min_size=1, max_size=3)}),
    ),
    max_leaves=6,
))
def test_parse_type_round_trip_is_fixpoint(spec):
    """parse_type over a valid nested typedef, serialized to Spark's
    own JSON type encoding and parsed back (pure-Python, no JVM),
    yields the identical DataType — the parser agrees with Spark's
    type lattice on every nesting it accepts (r10 advice: the
    typenames parser had only the fails-closed property, no
    round-trip)."""
    import json as _json

    from pyspark.sql import types as T

    dt = tn.parse_type(spec)
    back = T._parse_datatype_json_string(_json.dumps(dt.jsonValue()))
    assert back == dt
    assert back.simpleString() == dt.simpleString()
