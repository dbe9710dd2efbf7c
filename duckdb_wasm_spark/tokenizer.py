"""SQL tokenizer for shell highlighting — the `Tokenize(sql)` surface
(ref lib/src/webdb.cc:491-512; token categories
packages/duckdb-wasm/src/bindings/tokens.ts; goldens
lib/test/webdb_test.cc:77-79).

Returns {"offsets": [...], "types": [...]} where types follow the
reference enum: IDENTIFIER=0, NUMERIC_CONSTANT=1, STRING_CONSTANT=2,
OPERATOR=3, KEYWORD=4, COMMENT=5. Whitespace is skipped; offsets are
token start positions.
"""

from __future__ import annotations

IDENTIFIER, NUMERIC_CONSTANT, STRING_CONSTANT, OPERATOR, KEYWORD, COMMENT = (
    0, 1, 2, 3, 4, 5,
)

# SQL keywords (reserved words the reference's parser categorizes as
# KEYWORD; unreserved function-ish names lex as identifiers)
_KEYWORDS = {
    "all", "alter", "and", "anti", "any", "as", "asc", "between", "by",
    "case", "cast", "copy", "create", "cross", "database", "default",
    "delete", "desc", "distinct", "drop", "else", "end", "except",
    "exists", "export", "false", "filter", "for", "from", "full",
    "group", "having", "if", "ilike", "in", "inner", "insert",
    "intersect", "into", "is", "join", "left", "like", "limit", "not",
    "null", "offset", "on", "or", "order", "outer", "over", "partition",
    "pragma", "prepare", "primary", "references", "right", "select",
    "semi", "set", "table", "then", "to", "true", "union", "update",
    "using", "values", "view", "when", "where", "window", "with",
}


def tokenize(text: str) -> dict[str, list[int]]:
    offsets: list[int] = []
    types: list[int] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        start = i
        # comments
        if c == "-" and text[i : i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
            offsets.append(start)
            types.append(COMMENT)
            continue
        if c == "/" and text[i : i + 2] == "/*":
            end = text.find("*/", i + 2)
            i = n if end < 0 else end + 2
            offsets.append(start)
            types.append(COMMENT)
            continue
        # string constant
        if c == "'":
            i += 1
            while i < n:
                if text[i] == "'":
                    if text[i : i + 2] == "''":
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            offsets.append(start)
            types.append(STRING_CONSTANT)
            continue
        # quoted identifier
        if c == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 1
            i = min(i + 1, n)
            offsets.append(start)
            types.append(IDENTIFIER)
            continue
        # number
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            i += 1
            while i < n and (text[i].isdigit() or text[i] in ".eE+-"):
                if text[i] in "+-" and text[i - 1] not in "eE":
                    break
                i += 1
            offsets.append(start)
            types.append(NUMERIC_CONSTANT)
            continue
        # word: keyword or identifier
        if c.isalpha() or c == "_":
            i += 1
            while i < n and (text[i].isalnum() or text[i] == "_"):
                i += 1
            word = text[start:i].lower()
            offsets.append(start)
            types.append(KEYWORD if word in _KEYWORDS else IDENTIFIER)
            continue
        # parameter marker lexes as operator
        # everything else: operator (single char, incl. * , ( ) ; ? etc.)
        i += 1
        offsets.append(start)
        types.append(OPERATOR)
    return {"offsets": offsets, "types": types}
