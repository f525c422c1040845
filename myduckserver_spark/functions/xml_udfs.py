"""MySQL XML functions: ExtractValue / UpdateXML (manual 14.11).

Arrow-batched pandas UDFs over xml.etree — the same slow-path
discipline as the JSON mutation family (functions/json_udfs.py).
Reference surface: GMS corpus XML functions served through the MySQL
door. Supported XPath subset (what MySQL's own subset sees in
practice): absolute/relative element paths with optional [n]
one-based indexes, ``//`` descendant steps, a trailing ``/@attr``
attribute read, and ``*`` wildcards. Unsupported axes raise a clear
NotImplementedError at call time; invalid XML yields NULL (the UDF
family's error convention).

Semantics pinned to the MySQL manual:
  - ExtractValue returns the SPACE-JOINED direct text of every match
    (text() of matched elements, not their serialized subtree).
  - UpdateXML replaces the single matched element with the new
    fragment; zero or multiple matches return the document unchanged.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_UNSUPPORTED = re.compile(
    r"(?:::|\bnode\(\)|\bcomment\(\)|\bprocessing-instruction\b"
    r"|\blast\(\)|\bposition\(\)|\bcount\(|\||\[@)"
)


def _to_et_path(xpath: str) -> tuple[str, str | None]:
    """MySQL XPath subset → (ElementTree path, attr | None).

    The document root element is addressed explicitly in XPath
    (``/a/b``) while ElementTree's find starts BELOW the node it is
    called on — we call on a synthetic wrapper root, so the leading
    ``/`` simply drops.
    """
    if _UNSUPPORTED.search(xpath):
        raise NotImplementedError(
            f"unsupported XPath form for ExtractValue/UpdateXML: "
            f"{xpath!r} (element paths, [n] indexes, //, * and a "
            "trailing /@attr are supported)"
        )
    attr = None
    am = re.search(r"/@([\w:-]+)\s*$", xpath)
    if am:
        attr = am.group(1)
        xpath = xpath[: am.start()]
    p = xpath.strip()
    if p.startswith("//"):
        p = ".//" + p[2:]
    elif p.startswith("/"):
        p = p[1:]
    # interior // → ElementTree has no mid-path descendant axis
    if "//" in (p[3:] if p.startswith(".//") else p):
        raise NotImplementedError(
            "mid-path // is not supported in ExtractValue/UpdateXML "
            f"XPath: {xpath!r}"
        )
    if not p:
        raise NotImplementedError("empty XPath")
    return p, attr


def _findall(doc: str, xpath: str):
    p, attr = _to_et_path(xpath)
    root = ET.fromstring(f"<__mds_root__>{doc}</__mds_root__>")
    return root, root.findall(p), attr


def _extract_value(doc, xpath):
    root, hits, attr = _findall(doc, xpath)
    if attr is not None:
        vals = [h.get(attr) for h in hits]
        return " ".join(v for v in vals if v is not None)
    return " ".join((h.text or "").strip() for h in hits)


def _update_xml(doc, xpath, repl):
    p, attr = _to_et_path(xpath)
    if attr is not None:
        raise NotImplementedError(
            "UpdateXML on an attribute path is not supported"
        )
    root = ET.fromstring(f"<__mds_root__>{doc}</__mds_root__>")
    hits = root.findall(p)
    if len(hits) != 1:
        return doc  # MySQL: 0 or >1 matches → original document
    target = hits[0]
    # find the parent (ElementTree has no parent links)
    parent = next(
        (par for par in root.iter() if target in list(par)), None
    )
    if parent is None:
        return doc
    new_el = ET.fromstring(f"<__w__>{repl}</__w__>")
    idx = list(parent).index(target)
    tail = target.tail or ""
    children = list(new_el)
    lead_text = new_el.text or ""
    parent.remove(target)
    # splice the fragment's leading text where the element started
    if lead_text:
        if idx == 0:
            parent.text = (parent.text or "") + lead_text
        else:
            prev = list(parent)[idx - 1]
            prev.tail = (prev.tail or "") + lead_text
    for off, child in enumerate(children):
        parent.insert(idx + off, child)
    # re-attach the removed element's tail text
    if children:
        children[-1].tail = (children[-1].tail or "") + tail
    elif tail:
        if idx == 0:
            parent.text = (parent.text or "") + tail
        else:
            prev = list(parent)[idx - 1]
            prev.tail = (prev.tail or "") + tail
    return _strip_wrapper(ET.tostring(root, encoding="unicode"))


def _strip_wrapper(s: str) -> str:
    s = re.sub(r"^<__mds_root__>", "", s)
    return re.sub(r"</__mds_root__>$", "", s)


def _udf_wrap(fn):
    def batch(*cols: pd.Series) -> pd.Series:
        out = []
        for vals in zip(*cols):
            if any(v is None for v in vals):
                out.append(None)
                continue
            try:
                out.append(fn(*vals))
            except NotImplementedError:
                raise
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    return batch


def register_xml_udfs(spark: SparkSession) -> None:
    S = StringType()
    spark.udf.register(
        "extract_value2", F.pandas_udf(_udf_wrap(_extract_value), S)
    )
    spark.udf.register(
        "update_xml3", F.pandas_udf(_udf_wrap(_update_xml), S)
    )
