"""Token-level MySQL SQL lexer for the dialect front door.

The reference routes every MySQL query through a real parser-based
transpile (SQLGlot subprocess, reference: transpiler/translate.go:102).
SQLGlot isn't available in this image, so the front door gets the next
best thing: a faithful MySQL *lexer* and token-stream rewrites instead
of raw-text regexes. Lexing first is what eliminates the classic
normalizer failure class — rewrites can no longer fire inside string
literals, quoted identifiers, or comments, and function-argument
rewrites operate on balanced token spans instead of "no nested parens"
regex approximations.

Above the token rewrites sits a clause-position-aware structural pass
(mysql_compat._pass_structural) for the forms where the same token
means different things by position — SELECT-modifier STRAIGHT_JOIN vs
join-position, index hints in table refs, DISTINCTROW, LOCK IN SHARE
MODE tails, version-comment unwrap, PARTITION-selection rejection.
The remaining honest ceiling vs a full AST transpile: rewrites that
would need full expression-tree re-association (none of the reference
transpiler corpus requires one).

Token kinds:
  ws       whitespace (preserved)
  comment  -- ..., /* ... */, # ... (MySQL)
  str      'string' or "string" (MySQL double-quote-as-string)
  bq       `backtick identifier`
  word     identifier / keyword / function name
  num      numeric literal (incl. 0x..., 1.5e3)
  sysvar   @@global.x / @@x
  uservar  @x
  param    ?
  op       any other single/multi-char operator
"""

from __future__ import annotations

from dataclasses import dataclass

_OPS3 = ("<=>",)
_OPS2 = ("<=", ">=", "<>", "!=", ":=", "||", "&&", "<<", ">>", "->", "%s")


@dataclass
class Tok:
    kind: str
    text: str

    def is_word(self, *names: str) -> bool:
        return self.kind == "word" and self.text.upper() in names


def tokenize(sql: str, ansi_quotes: bool = False) -> list[Tok]:
    """ansi_quotes=True applies MySQL's ANSI_QUOTES sql_mode: double
    quotes delimit identifiers (emitted as backtick tokens), not
    strings (reference: GMS TestAnsiQuotesSqlMode)."""
    toks: list[Tok] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == '"' and ansi_quotes:
            j = i + 1
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':  # doubled quote
                        j += 2
                        continue
                    break
                j += 1
            body = sql[i + 1 : min(j, n)].replace('""', '"')
            toks.append(Tok("bq", "`" + body.replace("`", "``") + "`"))
            i = j + 1
            continue
        if c.isspace():
            j = i
            while j < n and sql[j].isspace():
                j += 1
            toks.append(Tok("ws", sql[i:j]))
            i = j
        elif c == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            j = n if j < 0 else j
            toks.append(Tok("comment", sql[i:j]))
            i = j
        elif c == "#":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            # MySQL-only comment form -> emit portable form
            toks.append(Tok("comment", "--" + sql[i + 1 : j]))
            i = j
        elif c == "/" and sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            toks.append(Tok("comment", sql[i:j]))
            i = j
        elif c in ("'", '"'):
            q = c
            j = i + 1
            while j < n:
                if sql[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if sql[j] == q:
                    if j + 1 < n and sql[j + 1] == q:  # doubled quote
                        j += 2
                        continue
                    break
                j += 1
            toks.append(Tok("str", sql[i : min(j + 1, n)]))
            i = j + 1
        elif c == "`":
            j = sql.find("`", i + 1)
            while 0 < j < n - 1 and sql[j + 1] == "`":  # doubled backtick
                j = sql.find("`", j + 2)
            j = n - 1 if j < 0 else j
            toks.append(Tok("bq", sql[i : j + 1]))
            i = j + 1
        elif c == "@":
            if sql.startswith("@@", i):
                j = i + 2
                while j < n and (sql[j].isalnum() or sql[j] in "._$"):
                    j += 1
                toks.append(Tok("sysvar", sql[i:j]))
            else:
                j = i + 1
                while j < n and (sql[j].isalnum() or sql[j] in "._$"):
                    j += 1
                toks.append(Tok("uservar", sql[i:j]))
            i = j
        elif c.isdigit() or (
            c == "." and i + 1 < n and sql[i + 1].isdigit()
        ):
            j = i
            if sql.startswith(("0x", "0X"), i):
                j = i + 2
                while j < n and sql[j] in "0123456789abcdefABCDEF":
                    j += 1
            else:
                while j < n and (sql[j].isdigit() or sql[j] == "."):
                    j += 1
                if j < n and sql[j] in "eE":
                    k = j + 1
                    if k < n and sql[k] in "+-":
                        k += 1
                    if k < n and sql[k].isdigit():
                        j = k
                        while j < n and sql[j].isdigit():
                            j += 1
            toks.append(Tok("num", sql[i:j]))
            i = j
        elif c.isalpha() or c in "_$":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] in "_$"):
                j += 1
            toks.append(Tok("word", sql[i:j]))
            i = j
        elif c == "?":
            toks.append(Tok("param", "?"))
            i += 1
        else:
            for op in _OPS3 + _OPS2:
                if sql.startswith(op, i):
                    toks.append(Tok("op", op))
                    i += len(op)
                    break
            else:
                toks.append(Tok("op", c))
                i += 1
    return toks


def render(toks: list[Tok]) -> str:
    return "".join(t.text for t in toks)


def sig_indices(toks: list[Tok]) -> list[int]:
    """Indices of significant (non-ws/comment) tokens."""
    return [i for i, t in enumerate(toks) if t.kind not in ("ws", "comment")]


def match_paren(toks: list[Tok], open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx (or -1)."""
    depth = 0
    for j in range(open_idx, len(toks)):
        t = toks[j]
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
            if depth == 0:
                return j
    return -1


def split_args(toks: list[Tok], open_idx: int, close_idx: int) -> list[list[Tok]]:
    """Split the token span inside (open_idx, close_idx) on top-level commas."""
    args: list[list[Tok]] = []
    cur: list[Tok] = []
    depth = 0
    for j in range(open_idx + 1, close_idx):
        t = toks[j]
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
        if t.kind == "op" and t.text == "," and depth == 0:
            args.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur or args:
        args.append(cur)
    # trim whitespace at the edges of each arg
    out = []
    for a in args:
        while a and a[0].kind == "ws":
            a = a[1:]
        while a and a[-1].kind == "ws":
            a = a[:-1]
        out.append(a)
    return out
