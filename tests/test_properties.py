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
@given(st.text(alphabet="ab:*()' ECXLUDE%", max_size=40))
def test_dialect_rewrite_preserves_string_literals(body):
    """Whatever surrounds it, a complete single-quoted literal's TEXT
    survives translation byte-for-byte (rewrites run outside protected
    spans only)."""
    lit = "'" + body.replace("'", "") + "'"
    sql = f"select {lit} as c from t"
    out, _ = dialect._rewrite_query_text(sql)
    assert lit in out
