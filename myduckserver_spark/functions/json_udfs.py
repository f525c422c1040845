"""MySQL JSON mutation/inspection functions (JSON_SET/INSERT/REPLACE/
REMOVE, CONTAINS[_PATH], OVERLAPS, SEARCH, DEPTH, TYPE, VALID, QUOTE,
PRETTY, MERGE_PATCH/PRESERVE, STORAGE_SIZE) as Arrow-batched pandas
UDFs — semantics Spark's built-in JSON functions lack (path-targeted
mutation, recursive containment). Per-row Python is the sanctioned
slow path here; the batch transfer is Arrow.

The MySQL spellings are variadic; the dialect layer
(mysql_compat._FN_HANDLERS) folds multi-pair calls into nested
single-pair calls over these fixed-arity bases, and wraps value
arguments as ``to_json(array(v))`` so types survive the string
boundary (a plain string value stays a JSON string, exactly MySQL's
rule — CAST(x AS JSON) is the explicit document spelling there too).

JSON_STORAGE_SIZE reuses the wire-accurate MySQL binary-JSON encoder
(streaming/mysql_json.py), so sizes are byte-faithful to the binlog
format rather than an approximation.

Reference: the MySQL server implements these natively; the reference
project inherits them via GMS on the MySQL surface.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType

_PATH_TOK = re.compile(r'\.(?:"([^"]+)"|([A-Za-z_]\w*))|\[(\d+)\]')


def _parse_path(path: str) -> list | None:
    """'$', '$.a.b', '$[0]', '$.a[2].b' → token list; None for
    unsupported forms (wildcards, ranges)."""
    s = (path or "").strip()
    if not s.startswith("$"):
        return None
    toks: list = []
    i = 1
    while i < len(s):
        m = _PATH_TOK.match(s, i)
        if not m:
            return None
        if m.group(3) is not None:
            toks.append(int(m.group(3)))
        else:
            toks.append(m.group(1) or m.group(2))
        i = m.end()
    return toks


def _parse_wpath(s: str):
    """Wildcard-capable path parser: $, .key, ."quoted", [n], [*],
    .*, ** legs (MySQL path grammar). None for malformed paths."""
    s = (s or "").strip()
    if not s.startswith("$"):
        return None
    i, toks = 1, []
    while i < len(s):
        if s.startswith("**", i):
            toks.append(("rec",))
            i += 2
            continue
        if s.startswith(".*", i):
            toks.append(("anykey",))
            i += 2
            continue
        if s.startswith("[*]", i):
            toks.append(("anyidx",))
            i += 3
            continue
        # [last], [last-N], [N to M], [N to last] (MySQL 8 ranges)
        m = re.match(
            r"\[\s*(last(?:\s*-\s*\d+)?|\d+)\s+to\s+"
            r"(last(?:\s*-\s*\d+)?|\d+)\s*\]",
            s[i:], re.I,
        )
        if m:
            toks.append(("range", _last_tok(m.group(1)),
                         _last_tok(m.group(2))))
            i += m.end()
            continue
        m = re.match(r"\[\s*last(?:\s*-\s*(\d+))?\s*\]", s[i:], re.I)
        if m:
            toks.append(("last", int(m.group(1) or 0)))
            i += m.end()
            continue
        m = re.match(r'\."([^"]+)"|\.([A-Za-z_]\w*)|\[(\d+)\]', s[i:])
        if not m:
            return None
        if m.group(3) is not None:
            toks.append(("idx", int(m.group(3))))
        else:
            toks.append(("key", m.group(1) or m.group(2)))
        i += m.end()
    return toks


def _last_tok(text: str):
    """'3' → 3; 'last' → ('last', 0); 'last-2' → ('last', 2)."""
    text = text.strip().lower()
    if text.startswith("last"):
        off = text[4:].replace("-", "").strip()
        return ("last", int(off or 0))
    return int(text)


def _resolve_idx(spec, n: int) -> int:
    return n - 1 - spec[1] if isinstance(spec, tuple) else spec


def _wmatch(doc, toks) -> list:
    """All values matching a wildcard path (document order-ish)."""
    if not toks:
        return [doc]
    t, rest = toks[0], toks[1:]
    out: list = []
    if t[0] == "key":
        if isinstance(doc, dict) and t[1] in doc:
            out += _wmatch(doc[t[1]], rest)
    elif t[0] == "idx":
        if isinstance(doc, list):
            if t[1] < len(doc):
                out += _wmatch(doc[t[1]], rest)
        elif t[1] == 0:
            out += _wmatch(doc, rest)  # MySQL: scalar acts as [0]
    elif t[0] == "last":
        if isinstance(doc, list):
            k = len(doc) - 1 - t[1]
            if 0 <= k < len(doc):
                out += _wmatch(doc[k], rest)
        elif t[1] == 0:
            out += _wmatch(doc, rest)  # scalar acts as its own last
    elif t[0] == "range":
        if isinstance(doc, list):
            lo = _resolve_idx(t[1], len(doc))
            hi = _resolve_idx(t[2], len(doc))
            for k in range(max(0, lo), min(hi, len(doc) - 1) + 1):
                out += _wmatch(doc[k], rest)
    elif t[0] == "anykey":
        if isinstance(doc, dict):
            for v in doc.values():
                out += _wmatch(v, rest)
    elif t[0] == "anyidx":
        if isinstance(doc, list):
            for v in doc:
                out += _wmatch(v, rest)
    else:  # rec: '**' applies the remaining legs at every depth
        out += _wmatch(doc, rest)
        if isinstance(doc, dict):
            for v in doc.values():
                out += _wmatch(v, toks)
        elif isinstance(doc, list):
            for v in doc:
                out += _wmatch(v, toks)
    return out


def _get(doc, toks):
    """→ (found, value) walking dict keys / list indexes."""
    cur = doc
    for t in toks:
        if isinstance(t, str) and isinstance(cur, dict) and t in cur:
            cur = cur[t]
        elif isinstance(t, int) and isinstance(cur, list) and t < len(cur):
            cur = cur[t]
        else:
            return False, None
    return True, cur


def _mutate(doc, toks, val, mode):
    """set = always write; insert = only if absent; replace = only if
    present (MySQL's trio). Writes through existing containers only —
    a missing intermediate step is a no-op, like MySQL."""
    if not toks:
        return val if mode in ("set", "replace") else doc
    parent_found, parent = _get(doc, toks[:-1])
    if not parent_found:
        return doc
    leaf = toks[-1]
    if isinstance(leaf, str) and isinstance(parent, dict):
        exists = leaf in parent
        if (exists and mode != "insert") or (not exists and mode != "replace"):
            parent[leaf] = val
    elif isinstance(leaf, int) and isinstance(parent, list):
        if leaf < len(parent):
            if mode != "insert":
                parent[leaf] = val
        elif mode != "replace":
            parent.append(val)  # past-the-end appends (MySQL rule)
    return doc


def _contains(target, cand) -> bool:
    """MySQL containment: candidate object ⊆ target object
    (recursively); array contains every candidate element; scalar
    equality; a scalar is contained in an array that has it."""
    if isinstance(target, dict) and isinstance(cand, dict):
        return all(
            k in target and _contains(target[k], v) for k, v in cand.items()
        )
    if isinstance(target, list):
        if isinstance(cand, list):
            return all(
                any(_contains(t, c) for t in target) for c in cand
            )
        return any(_contains(t, cand) for t in target)
    # scalars: booleans only match booleans (JSON true != 1); numbers
    # compare across int/float (JSON 1 == 1.0, MySQL's rule)
    if isinstance(target, bool) or isinstance(cand, bool):
        return isinstance(target, bool) and isinstance(cand, bool) \
            and target == cand
    if isinstance(target, (int, float)) and isinstance(cand, (int, float)):
        return target == cand
    return type(target) is type(cand) and target == cand


def _depth(doc) -> int:
    if isinstance(doc, dict):
        return 1 + max((_depth(v) for v in doc.values()), default=0)
    if isinstance(doc, list):
        return 1 + max((_depth(v) for v in doc), default=0)
    return 1


def _mysql_type(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "INTEGER"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "STRING"
    if isinstance(v, list):
        return "ARRAY"
    return "OBJECT"


def _loads(s):
    return json.loads(s)


def _first_val(valjson: str):
    """The dialect layer ships values as to_json(array(v))."""
    return json.loads(valjson)[0]


def _walk_search(doc, rx, prefix, hits, one: bool):
    if isinstance(doc, str) and rx.fullmatch(doc):
        hits.append(prefix)
        return one
    if isinstance(doc, dict):
        for k, v in doc.items():
            if _walk_search(v, rx, f'{prefix}.{k}', hits, one):
                return True
    elif isinstance(doc, list):
        for i, v in enumerate(doc):
            if _walk_search(v, rx, f'{prefix}[{i}]', hits, one):
                return True
    return False


def _merge_preserve(a, b):
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _merge_preserve(out[k], v) if k in out else v
        return out
    la = a if isinstance(a, list) else [a]
    lb = b if isinstance(b, list) else [b]
    return la + lb


def _merge_patch(a, b):
    if not isinstance(b, dict):
        return b
    out = a if isinstance(a, dict) else {}
    out = dict(out)
    for k, v in b.items():
        if v is None:
            out.pop(k, None)
        else:
            out[k] = _merge_patch(out.get(k), v)
    return out


def _udf_str(fn):
    def batch(*cols: pd.Series) -> pd.Series:
        out = []
        for vals in zip(*cols):
            try:
                out.append(None if any(v is None for v in vals)
                           else fn(*vals))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)
    return batch


def register_json_udfs(spark: SparkSession) -> None:
    """Idempotent session registration (the engine calls this at
    construction, like the reference's provider init)."""
    S, I = StringType(), IntegerType()
    reg = spark.udf.register

    reg("json_set1", F.pandas_udf(_udf_str(
        lambda d, p, vj: json.dumps(_mutate(
            _loads(d), _parse_path(p), _first_val(vj), "set"))
    ), S))
    reg("json_insert1", F.pandas_udf(_udf_str(
        lambda d, p, vj: json.dumps(_mutate(
            _loads(d), _parse_path(p), _first_val(vj), "insert"))
    ), S))
    reg("json_replace1", F.pandas_udf(_udf_str(
        lambda d, p, vj: json.dumps(_mutate(
            _loads(d), _parse_path(p), _first_val(vj), "replace"))
    ), S))

    def _remove(d, p):
        doc = _loads(d)
        toks = _parse_path(p)
        if not toks:
            return None
        found, parent = _get(doc, toks[:-1])
        leaf = toks[-1]
        if found and isinstance(parent, dict) and isinstance(leaf, str):
            parent.pop(leaf, None)
        elif found and isinstance(parent, list) and isinstance(leaf, int) \
                and leaf < len(parent):
            parent.pop(leaf)
        return json.dumps(doc)

    reg("json_remove1", F.pandas_udf(_udf_str(_remove), S))
    # CAST(x AS JSON): parse + re-serialize to the canonical form the
    # rest of the family emits; invalid JSON text → NULL (the family's
    # error convention; MySQL raises 3141)
    reg("json_cast1", F.pandas_udf(_udf_str(
        lambda d: json.dumps(_loads(d))
    ), S))
    # heterogeneous JSON_ARRAY/JSON_OBJECT constructors: each value
    # arrives independently encoded as to_json(array(v)) so Spark's
    # homogeneous-array rule never coerces (MySQL keeps per-value
    # types); output uses the mutation family's spaced formatting
    reg("json_build_arr", F.pandas_udf(_udf_str(
        lambda enc: json.dumps([json.loads(e)[0] for e in enc])
    ), S))
    reg("json_build_obj", F.pandas_udf(_udf_str(
        lambda keys, enc: json.dumps(dict(zip(
            list(keys), [json.loads(e)[0] for e in enc])))
    ), S))
    # pg set-returning json_array_elements[_text]: the dialect layer
    # wraps these in explode()
    from pyspark.sql.types import ArrayType

    AS_ = ArrayType(StringType())
    reg("json_arr_elems", F.pandas_udf(_udf_str(
        lambda d: [json.dumps(e) for e in _loads(d)]
    ), AS_))
    reg("json_arr_elems_text", F.pandas_udf(_udf_str(
        lambda d: [
            e if isinstance(e, str)
            else (None if e is None else json.dumps(e))
            for e in _loads(d)
        ]
    ), AS_))
    # pg set-returning json_each / jsonb_each[_text] /
    # json_object_keys: the dialect layer explodes these — inline()
    # over the (key, value) entry array, explode() over the key list
    from pyspark.sql.types import StructField, StructType

    KV = ArrayType(StructType([
        StructField("key", StringType()),
        StructField("value", StringType()),
    ]))

    def _obj_items(d, text: bool):
        doc = _loads(d)
        out = []
        for k, v in doc.items():
            if text and isinstance(v, str):
                out.append((k, v))
            elif text and v is None:
                out.append((k, None))
            else:
                out.append((k, json.dumps(v)))
        return out

    reg("json_obj_entries", F.pandas_udf(_udf_str(
        lambda d: _obj_items(d, False)), KV))
    reg("json_obj_entries_text", F.pandas_udf(_udf_str(
        lambda d: _obj_items(d, True)), KV))
    reg("json_obj_keys", F.pandas_udf(_udf_str(
        lambda d: list(_loads(d).keys())), AS_))

    def _extract_w(d, ps):
        """JSON_EXTRACT with wildcard and/or several paths (\\x1f-
        joined): single plain path → the value; wildcards or several
        paths → the JSON array of matches; no match → NULL (MySQL)."""
        doc = _loads(d)
        paths = (ps or "").split("\x1f")
        vals: list = []
        wild = False
        for p in paths:
            toks = _parse_wpath(p)
            if toks is None:
                return None
            if any(t[0] in ("anykey", "anyidx", "rec", "range")
                   for t in toks):
                wild = True  # ranges return an array like wildcards
            vals += _wmatch(doc, toks)
        if not vals:
            return None
        if len(paths) == 1 and not wild:
            return json.dumps(vals[0])
        return json.dumps(vals)

    reg("json_extract_w", F.pandas_udf(_udf_str(_extract_w), S))

    def _arr_append(d, p, vj):
        doc = _loads(d)
        toks = _parse_path(p)
        val = _first_val(vj)
        if toks is None:
            return None
        found, tgt = _get(doc, toks)
        if not found:
            return json.dumps(doc)
        if isinstance(tgt, list):
            tgt.append(val)
        elif not toks:
            doc = [doc, val]  # MySQL wraps a scalar target
        else:
            _found, parent = _get(doc, toks[:-1])
            leaf = toks[-1]
            if isinstance(parent, dict):
                parent[leaf] = [tgt, val]
            elif isinstance(parent, list) and isinstance(leaf, int):
                parent[leaf] = [tgt, val]
        return json.dumps(doc)

    reg("json_array_append1", F.pandas_udf(_udf_str(_arr_append), S))

    def _arr_insert(d, p, vj):
        doc = _loads(d)
        toks = _parse_path(p)
        val = _first_val(vj)
        # MySQL requires the path to end in an array cell [n]
        if not toks or not isinstance(toks[-1], int):
            return None
        found, parent = _get(doc, toks[:-1])
        if found and isinstance(parent, list):
            parent.insert(min(toks[-1], len(parent)), val)
        return json.dumps(doc)

    reg("json_array_insert1", F.pandas_udf(_udf_str(_arr_insert), S))

    def _length_at(d, p):
        toks = _parse_path(p)
        if toks is None:
            return None
        found, v = _get(_loads(d), toks)
        if not found:
            return None
        if isinstance(v, list):
            return len(v)
        if isinstance(v, dict):
            return len(v.keys())
        return 1  # scalars have length 1 (MySQL)

    reg("json_length_at", F.pandas_udf(_udf_str(_length_at), I))
    reg("json_contains2", F.pandas_udf(_udf_str(
        lambda t, c: int(_contains(_loads(t), _loads(c)))
    ), I))
    # 3-arg JSON_CONTAINS(doc, cand, path): extract the path with real
    # JSON semantics (get_json_object would strip the quotes off string
    # scalars, so '"x"' could never match), then contain-test. MySQL
    # returns NULL when the path doesn't exist.
    def _contains_at(d, c, p):
        toks = _parse_path(p)
        if toks is None:
            return None
        found, tgt = _get(_loads(d), toks)
        if not found:
            return None
        return int(_contains(tgt, _loads(c)))

    reg("json_contains3", F.pandas_udf(_udf_str(_contains_at), I))
    reg("json_contains_path1", F.pandas_udf(_udf_str(
        lambda d, p: int(_get(_loads(d), _parse_path(p))[0])
    ), I))
    reg("json_overlaps2", F.pandas_udf(_udf_str(
        lambda a, b: int((lambda x, y: (
            any(any(_contains(i, j) and _contains(j, i) for j in y)
                for i in x)
            if isinstance(x, list) and isinstance(y, list) else
            any(k in y and x[k] == y[k] for k in x)
            if isinstance(x, dict) and isinstance(y, dict) else
            any(_contains(i, y) for i in x) if isinstance(x, list) else
            any(_contains(j, x) for j in y) if isinstance(y, list) else
            x == y
        ))(_loads(a), _loads(b)))
    ), I))

    def _search(d, one_all, pat):
        rx = re.compile(
            re.escape(pat).replace("%", ".*").replace("_", "."),
            re.S,
        )
        hits: list = []
        _walk_search(_loads(d), rx, "$", hits,
                     one_all.lower() == "one")
        if not hits:
            return None
        return json.dumps(hits[0] if len(hits) == 1 else hits)

    reg("json_search3", F.pandas_udf(_udf_str(_search), S))
    reg("json_depth", F.pandas_udf(_udf_str(
        lambda d: _depth(_loads(d))
    ), I))
    reg("json_pretty", F.pandas_udf(_udf_str(
        lambda d: json.dumps(_loads(d), indent=2)
    ), S))
    # pg jsonb_pretty uses 4-space indentation
    reg("json_pretty_pg", F.pandas_udf(_udf_str(
        lambda d: json.dumps(_loads(d), indent=4)
    ), S))

    def _strip_nulls(v):
        """pg json_strip_nulls: drop null-valued OBJECT fields at any
        depth; array null elements stay."""
        if isinstance(v, dict):
            return {k: _strip_nulls(x) for k, x in v.items()
                    if x is not None}
        if isinstance(v, list):
            return [_strip_nulls(x) for x in v]
        return v

    reg("json_strip_nulls1", F.pandas_udf(_udf_str(
        lambda d: json.dumps(_strip_nulls(_loads(d)))
    ), S))

    # pg jsonb value operators (functions-json table, pg docs):
    # a || b concatenate/merge, a - 'key' / a - idx delete.
    def _jsonb_concat(a, b):
        x, y = _loads(a), _loads(b)
        if isinstance(x, dict) and isinstance(y, dict):
            return json.dumps({**x, **y})
        if not isinstance(x, list):
            x = [x]
        if not isinstance(y, list):
            y = [y]
        return json.dumps(x + y)

    reg("jsonb_concat1", F.pandas_udf(_udf_str(_jsonb_concat), S))

    def _jsonb_del_key(d, k):
        doc = _loads(d)
        if isinstance(doc, dict):
            doc.pop(k, None)
            return json.dumps(doc)
        if isinstance(doc, list):
            return json.dumps([e for e in doc if e != k])
        return None  # pg errors on scalars; NULL keeps the row visible

    reg("jsonb_del_key1", F.pandas_udf(_udf_str(_jsonb_del_key), S))

    def _jsonb_del_idx(d, i):
        doc = _loads(d)
        if not isinstance(doc, list):
            return None
        i = int(i)
        if i < 0:
            i += len(doc)
        if 0 <= i < len(doc):
            doc.pop(i)
        return json.dumps(doc)

    reg("jsonb_del_idx1", F.pandas_udf(_udf_str(_jsonb_del_idx), S))

    # pg json[b]_typeof names (json_mysql_type speaks MySQL's)
    def _pg_typeof(d):
        v = _loads(d)
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, (int, float)):
            return "number"
        if isinstance(v, str):
            return "string"
        if isinstance(v, list):
            return "array"
        return "object"

    reg("json_pg_typeof", F.pandas_udf(_udf_str(_pg_typeof), S))

    # compact separators: unwrapping to_json(array(x)) must be a
    # formatting no-op vs Spark's own to_json output
    reg("pg_scalar_json1", F.pandas_udf(_udf_str(
        lambda enc: json.dumps(json.loads(enc)[0],
                               separators=(",", ":"))
    ), S))

    # SQL/JSON path subset (pg jsonpath): legs `$`, `.key`, `[n]`
    # (negative from end), `[*]`, `.*`; an optional trailing filter
    # `? (@ <op> <literal>)` or `? (@.key <op> <literal>)`. Wider
    # constructs (arithmetic, functions, nested filters) return NULL
    # rather than a wrong answer.
    _JPATH_LEG = re.compile(
        r"\.(?:\*|\"([^\"]+)\"|([A-Za-z_]\w*))|\[\s*(\*|-?\d+)\s*\]")
    _JPATH_FILT = re.compile(
        r"\?\s*\(\s*@(?:\.([A-Za-z_]\w*))?\s*"
        r"(==|!=|<>|<=|>=|<|>)\s*"
        r"('(?:[^']|'')*'|\"[^\"]*\"|-?\d+(?:\.\d+)?|true|false|null)"
        r"\s*\)\s*$")

    def _jpath_eval(doc, path):
        s = (path or "").strip()
        if not s.startswith("$"):
            return None
        filt = None
        fm = _JPATH_FILT.search(s)
        if fm:
            s = s[:fm.start()].rstrip()
            key, op, lit = fm.group(1), fm.group(2), fm.group(3)
            if lit.startswith("'"):
                litv = lit[1:-1].replace("''", "'")
            elif lit.startswith('"'):
                litv = lit[1:-1]
            elif lit in ("true", "false"):
                litv = lit == "true"
            elif lit == "null":
                litv = None
            else:
                litv = float(lit) if "." in lit else int(lit)
            filt = (key, op, litv)
        cur = [_loads(doc)]
        i = 1
        while i < len(s):
            m = _JPATH_LEG.match(s, i)
            if not m:
                return None  # unsupported construct
            nxt = []
            if m.group(0).startswith(".") and m.group(0) != ".*":
                k = m.group(1) or m.group(2)
                for v in cur:
                    if isinstance(v, dict) and k in v:
                        nxt.append(v[k])
            elif m.group(0) == ".*":
                for v in cur:
                    if isinstance(v, dict):
                        nxt.extend(v.values())
            else:
                idx = m.group(3)
                for v in cur:
                    if not isinstance(v, list):
                        # pg lax mode auto-wraps scalars
                        v = [v]
                    if idx == "*":
                        nxt.extend(v)
                    else:
                        j = int(idx)
                        if j < 0:
                            j += len(v)
                        if 0 <= j < len(v):
                            nxt.append(v[j])
            cur = nxt
            i = m.end()
        if filt is not None:
            key, op, litv = filt

            def keep(v):
                t = v.get(key) if key else v
                if isinstance(v, dict) and key and key not in v:
                    return False
                try:
                    if op == "==":
                        return t == litv
                    if op in ("!=", "<>"):
                        return t != litv
                    if t is None or litv is None:
                        return False
                    if op == "<":
                        return t < litv
                    if op == "<=":
                        return t <= litv
                    if op == ">":
                        return t > litv
                    return t >= litv
                except TypeError:
                    return False

            cur = [v for v in cur if keep(v)]
        return cur

    def _jp_exists(d, p):
        r = _jpath_eval(d, p)
        return None if r is None else (1 if len(r) > 0 else 0)

    reg("jsonb_path_exists1", F.pandas_udf(_udf_str(_jp_exists), I))

    def _jp_query_array(d, p):
        r = _jpath_eval(d, p)
        return None if r is None else json.dumps(r)

    reg("jsonb_path_query_array1",
        F.pandas_udf(_udf_str(_jp_query_array), S))

    def _jp_query_first(d, p):
        r = _jpath_eval(d, p)
        return None if not r else json.dumps(r[0])

    reg("jsonb_path_query_first1",
        F.pandas_udf(_udf_str(_jp_query_first), S))

    def _jp_match(d, p):
        # predicate form `$.a > 1` (pg jsonb_path_match takes a
        # predicate path, not a filter suffix)
        pm = re.match(
            r"^\s*(\$\S*)\s*(==|!=|<>|<=|>=|<|>)\s*"
            r"('(?:[^']|'')*'|-?\d+(?:\.\d+)?|true|false|null)\s*$",
            p or "")
        if pm:
            r = _jpath_eval(d, pm.group(1))
            if not r:
                return None
            lit = pm.group(3)
            if lit.startswith("'"):
                litv = lit[1:-1].replace("''", "'")
            elif lit in ("true", "false"):
                litv = lit == "true"
            elif lit == "null":
                litv = None
            else:
                litv = float(lit) if "." in lit else int(lit)
            t, op = r[0], pm.group(2)
            try:
                if op == "==":
                    return 1 if t == litv else 0
                if op in ("!=", "<>"):
                    return 1 if t != litv else 0
                if t is None or litv is None:
                    return None
                ok = {"<": t < litv, "<=": t <= litv,
                      ">": t > litv, ">=": t >= litv}[op]
                return 1 if ok else 0
            except TypeError:
                return None
        r = _jpath_eval(d, p)
        if not r or not isinstance(r[0], bool):
            return None
        return 1 if r[0] else 0

    reg("jsonb_path_match1", F.pandas_udf(_udf_str(_jp_match), I))

    # jsonb @> / <@ containment (pg 9.4 semantics: structures match
    # recursively; a top-level array may contain a bare primitive;
    # bool and number JSON types never compare equal)
    def _jb_eq(a, b):
        if isinstance(a, bool) or isinstance(b, bool):
            return isinstance(a, bool) and isinstance(b, bool) \
                and a == b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return a == b
        return type(a) is type(b) and a == b

    def _jb_contains(a, b, top=False):
        if isinstance(b, dict):
            return isinstance(a, dict) and all(
                k in a and _jb_contains(a[k], v) for k, v in b.items()
            )
        if isinstance(b, list):
            return isinstance(a, list) and all(
                any(_jb_contains(x, e) for x in a) for e in b
            )
        if top and isinstance(a, list):
            return any(_jb_eq(x, b) for x in a)
        return _jb_eq(a, b)

    def _jb_contains_top(da, db):
        a, b = _loads(da), _loads(db)
        return 1 if _jb_contains(a, b, top=True) else 0

    reg("jsonb_contains1", F.pandas_udf(_udf_str(_jb_contains_top), I))
    reg("json_quote1", F.pandas_udf(_udf_str(
        lambda s: json.dumps(s)
    ), S))
    reg("json_mysql_type", F.pandas_udf(_udf_str(
        lambda d: _mysql_type(_loads(d))
    ), S))

    def _valid(s):
        try:
            json.loads(s)
            return 1
        except Exception:
            return 0

    reg("json_valid1", F.pandas_udf(_udf_str(_valid), I))

    def _storage_size(d):
        from myduckserver_spark.streaming.mysql_json import (
            encode_binary_json,
        )

        return len(encode_binary_json(_loads(d)))

    reg("json_storage_size1", F.pandas_udf(_udf_str(_storage_size), I))
    reg("json_merge_patch2", F.pandas_udf(_udf_str(
        lambda a, b: json.dumps(_merge_patch(_loads(a), _loads(b)))
    ), S))
    reg("json_merge_preserve2", F.pandas_udf(_udf_str(
        lambda a, b: json.dumps(_merge_preserve(_loads(a), _loads(b)))
    ), S))
