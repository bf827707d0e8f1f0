"""OTTL XML converter family — ParseXML, ParseSimplifiedXML, GetXML,
InsertXML, RemoveXML, ConvertAttributesToElementsXML,
ConvertTextToElementsXML.

Reference: ``pkg/ottl/ottlfuncs/func_parse_xml.go`` (tag/attributes/content/
children map), ``func_parse_simplified_xml.go`` (leaf-text map, repeated tags
→ slice), ``func_get_xml.go`` (serialize matched nodes; attribute/chardata →
value text), ``func_insert_xml.go`` (append subdocument children to each
selected element), ``func_remove_xml.go`` (remove elements/attributes/text),
``func_convert_attributes_to_elements_xml.go`` (attr → appended child
element, default ``//@*``), ``func_convert_text_to_elements_xml.go`` (wrap
extraneous text nodes, default xpath ``/``, element ``value``).

XML document rewriting is inherently per-string-document work with no
Column-expression equivalent (Spark's ``xpath_*`` only extracts), so this is
the sanctioned slow path: Arrow-batched pandas UDFs over stdlib
``xml.etree.ElementTree``. Dynamic map results (ParseXML /
ParseSimplifiedXML) are returned as JSON strings — the flat model's
representation for truly dynamic residue (SURVEY §1.3).

Supported XPath subset (what the reference's own tests exercise): absolute
paths ``/a/b``, descendant axis ``//b`` / ``/a//b``, wildcard ``*``,
attribute steps ``@name`` / ``@*``, ``text()``, and bare ``/``. Namespaces,
predicates and functions are out of scope. Comments/processing instructions
are dropped on parse (the reference ignores them in ParseXML; for rewrites
they survive only until the first rewrite there — here they're always
dropped, documented divergence).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_MAX_DEPTH = 10_000  # maxXMLElementDepth, func_parse_xml.go:68


# ------------------------------------------------------------- node model
# plain __slots__ classes, not dataclasses: these are constructed per node
# per document inside the Arrow batch loop, and slotted instances measure
# ~35% cheaper to build (no __dict__, no generated dataclass machinery) —
# per-doc parse cost is the floor of the whole ottl_xml row


class _Text:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


class _Elem:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: list, children: list | None = None):
        self.tag = tag
        self.attrs = attrs  # list[(name, value)] — preserves document order
        self.children = [] if children is None else children  # _Elem | _Text


class _Doc:
    """Virtual document node: holds top-level elements (and stray text)."""

    __slots__ = ("children", "decl")

    def __init__(self, children: list | None = None, decl: str = ""):
        self.children = [] if children is None else children
        self.decl = decl  # original <?xml ...?> declaration, if present


class XMLArgError(ValueError):
    pass


def _from_et(e: ET.Element, depth: int = 0) -> _Elem:
    if depth > _MAX_DEPTH:
        raise XMLArgError("exceeded maximum XML nesting depth")
    node = _Elem(tag=e.tag, attrs=list(e.attrib.items()))
    if e.text:
        node.children.append(_Text(e.text))
    for ch in e:
        node.children.append(_from_et(ch, depth + 1))
        if ch.tail:
            node.children.append(_Text(ch.tail))
    return node


def _parse_doc(s: str) -> _Doc:
    """Parse possibly-multi-root XML into a document node, preserving the
    XML declaration iff present (func_remove_xml.go parseNodesXML)."""
    s = s or ""
    decl = ""
    stripped = s.lstrip()
    if stripped.startswith("<?xml"):
        end = stripped.index("?>") + 2
        decl = stripped[:end]
        stripped = stripped[end:]
    # wrap so multi-root documents and top-level text parse
    root = ET.fromstring(f"<__doc__>{stripped}</__doc__>")
    doc = _Doc(decl=decl)
    if root.text and root.text.strip():
        doc.children.append(_Text(root.text))
    for ch in root:
        doc.children.append(_from_et(ch))
        if ch.tail and ch.tail.strip():
            doc.children.append(_Text(ch.tail))
    return doc


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return _esc_text(s).replace('"', "&#34;")


def _ser(n) -> str:
    if isinstance(n, _Text):
        return _esc_text(n.data)
    attrs = "".join(f' {k}="{_esc_attr(v)}"' for k, v in n.attrs)
    inner = "".join(_ser(c) for c in n.children)
    return f"<{n.tag}{attrs}>{inner}</{n.tag}>"


def _ser_doc(doc: _Doc) -> str:
    return doc.decl + "".join(_ser(c) for c in doc.children)


# ------------------------------------------------------------ xpath subset

def _xpath_steps(xp: str) -> list[tuple[str, str]]:
    xp = (xp or "").strip()
    if xp in ("", "/"):
        return []
    steps: list[tuple[str, str]] = []
    i = 0
    while i < len(xp):
        if xp.startswith("//", i):
            axis, i = "desc", i + 2
        elif xp.startswith("/", i):
            axis, i = "child", i + 1
        else:
            axis = "child"
        j = xp.find("/", i)
        j = len(xp) if j < 0 else j
        step = xp[i:j]
        if not step:
            raise XMLArgError(f"invalid xpath {xp!r}")
        steps.append((axis, step))
        i = j
    return steps


def _descendants(n) -> list:
    out = []
    for c in getattr(n, "children", []):
        if isinstance(c, _Elem):
            out.append(c)
            out.extend(_descendants(c))
    return out


def _select(doc: _Doc, xp: str) -> list[tuple]:
    """Evaluate the xpath subset. Returns typed matches:
    ('doc', doc) | ('elem', parent, elem) | ('attr', owner, name) |
    ('text', owner, text_node)."""
    steps = _xpath_steps(xp)
    if not steps:
        return [("doc", doc)]
    # current: list of (parent_or_None, node) element/doc positions
    cur: list[tuple] = [(None, doc)]
    results: list[tuple] = []
    for si, (axis, step) in enumerate(steps):
        last = si == len(steps) - 1
        nxt: list[tuple] = []
        for _, node in cur:
            if step.startswith("@"):
                if not last:
                    raise XMLArgError("attribute step must be last")
                name = step[1:]
                owners = [node] if isinstance(node, _Elem) else []
                if axis == "desc":
                    owners = owners + _descendants(node)
                for owner in owners:
                    for k, _v in list(owner.attrs):
                        if name == "*" or k == name:
                            results.append(("attr", owner, k))
                continue
            if step == "text()":
                if not last:
                    raise XMLArgError("text() step must be last")
                pool = [node] if axis == "child" else [node] + _descendants(node)
                for owner in pool:
                    for c in getattr(owner, "children", []):
                        if isinstance(c, _Text):
                            results.append(("text", owner, c))
                continue
            # element step
            if axis == "child":
                for c in getattr(node, "children", []):
                    if isinstance(c, _Elem) and (step == "*" or c.tag == step):
                        (results if last else nxt).append(
                            ("elem", node, c) if last else (node, c)
                        )
            else:  # descendant
                stack = [(node, c) for c in getattr(node, "children", []) if isinstance(c, _Elem)]
                while stack:
                    parent, e = stack.pop(0)
                    if step == "*" or e.tag == step:
                        (results if last else nxt).append(
                            ("elem", parent, e) if last else (parent, e)
                        )
                    stack[0:0] = [(e, c) for c in e.children if isinstance(c, _Elem)]
        cur = nxt
    return results


# ----------------------------------------------------- per-string functions

def _desc_attrs_docorder(doc: _Doc) -> list[tuple]:
    """All attributes in document order (the //@* default)."""
    out = []

    def walk(e):
        for k, _ in list(e.attrs):
            out.append(("attr", e, k))
        for c in e.children:
            if isinstance(c, _Elem):
                walk(c)

    for c in doc.children:
        if isinstance(c, _Elem):
            walk(c)
    return out


def parse_xml_str(s: str) -> str | None:
    """ParseXML → JSON of the {tag, content?, attributes?, children?} map.

    Text chunks are whitespace-trimmed and concatenated
    (func_parse_xml.go UnmarshalXML CharData branch)."""
    try:
        root = ET.fromstring(s)
    except ET.ParseError:
        return None

    def conv(e: ET.Element, depth: int = 0) -> dict:
        if depth > _MAX_DEPTH:
            raise XMLArgError("max depth")
        m: dict = {"tag": e.tag}
        text = (e.text or "").strip() + "".join((c.tail or "").strip() for c in e)
        if text:
            m["content"] = text
        if e.attrib:
            m["attributes"] = dict(e.attrib)
        kids = [conv(c, depth + 1) for c in e]
        if kids:
            m["children"] = kids
        return m

    return json.dumps(conv(root), separators=(",", ":"))


def parse_simplified_xml_str(s: str) -> str | None:
    """ParseSimplifiedXML → JSON map: leaf element → text; repeated tag →
    list; attributes and extraneous text dropped
    (func_parse_simplified_xml.go parseElement)."""
    try:
        doc = _parse_doc(s)
    except (ET.ParseError, XMLArgError):
        return None
    return parse_simplified_from_doc(doc)


def parse_simplified_from_doc(doc: "_Doc") -> str | None:
    """ParseSimplifiedXML over an already-parsed doc (read-only — shareable
    across converters in a fused statement run)."""

    def leaf_value(e: _Elem) -> str:
        if any(isinstance(c, _Elem) for c in e.children):
            return ""
        for c in e.children:
            if isinstance(c, _Text) and c.data:
                return c.data
        return ""

    def parse_elem(parent, depth: int = 0) -> dict:
        if depth > _MAX_DEPTH:
            raise XMLArgError("max depth")
        counts: dict[str, int] = {}
        elems = [c for c in getattr(parent, "children", []) if isinstance(c, _Elem)]
        for c in elems:
            counts[c.tag] = counts.get(c.tag, 0) + 1
        out: dict = {}
        for c in elems:
            if not c.children:
                continue  # FirstChild == nil ⇒ skipped by the reference
            lv = leaf_value(c)
            if counts[c.tag] > 1:
                slot = out.setdefault(c.tag, [])
                if lv != "":
                    slot.append(lv)
                    continue
                cm = parse_elem(c, depth + 1)
                if cm:
                    slot.append(cm)
                continue
            if lv != "":
                out[c.tag] = lv
                continue
            cm = parse_elem(c, depth + 1)
            if cm:
                out[c.tag] = cm
        return out

    return json.dumps(parse_elem(doc), separators=(",", ":"))


def get_xml_str(s: str, xp: str) -> str | None:
    """GetXML: serialize matched elements/text; attribute matches contribute
    their value as text (func_get_xml.go:60-75)."""
    if not s:
        return ""
    try:
        doc = _parse_doc(s)
    except (ET.ParseError, XMLArgError):
        return None
    return get_xml_from_doc(doc, xp)


def get_xml_from_doc(doc: "_Doc", xp: str) -> str | None:
    """GetXML over an already-parsed doc (read-only — shareable across
    converters in a fused statement run)."""
    try:
        matches = _select(doc, xp)
    except XMLArgError:
        return None
    parts = []
    for m in matches:
        if m[0] == "elem":
            parts.append(_ser(m[2]))
        elif m[0] == "text":
            parts.append(_esc_text(m[2].data))
        elif m[0] == "attr":
            owner, name = m[1], m[2]
            parts.append(_esc_text(dict(owner.attrs).get(name, "")))
    return "".join(parts)


def _copy_node(n):
    if isinstance(n, _Text):
        return _Text(n.data)
    return _Elem(n.tag, list(n.attrs), [_copy_node(c) for c in n.children])


def insert_xml_str(s: str, xp: str, sub: str) -> str | None:
    """InsertXML: append the subdocument's top-level nodes as last children
    of each selected element (func_insert_xml.go; a fresh copy per target,
    where the reference moves the same nodes)."""
    try:
        doc = _parse_doc(s)
        subdoc = _parse_doc(sub or "")
        matches = _select(doc, xp)
    except (ET.ParseError, XMLArgError):
        return None
    for m in matches:
        if m[0] == "elem":
            m[2].children.extend(_copy_node(c) for c in subdoc.children)
        elif m[0] == "doc":
            m[1].children.extend(_copy_node(c) for c in subdoc.children)
    return _ser_doc(doc)


def copy_doc(doc: _Doc) -> _Doc:
    """Deep copy of a parsed doc — ~4× cheaper than re-parsing the string,
    which is what makes mutating converters shareable in a fused run."""
    return _Doc(children=[_copy_node(c) for c in doc.children], decl=doc.decl)


def remove_xml_from_doc(doc: _Doc, xp: str) -> str | None:
    """RemoveXML over a PRIVATE copy of an already-parsed doc (fused runs:
    one shared parse, each mutating converter copies instead of re-parsing).
    Same output as ``remove_xml_str`` on the original string."""
    doc = copy_doc(doc)
    try:
        matches = _select(doc, xp)
    except XMLArgError:
        return None
    _apply_removals(doc, matches)
    return _ser_doc(doc)


def _apply_removals(doc: _Doc, matches: list) -> None:
    for m in matches:
        if m[0] == "elem":
            parent, e = m[1], m[2]
            if e in parent.children:
                parent.children.remove(e)
        elif m[0] == "attr":
            owner, name = m[1], m[2]
            owner.attrs = [(k, v) for k, v in owner.attrs if k != name]
        elif m[0] == "text":
            owner, t = m[1], m[2]
            if t in owner.children:
                owner.children.remove(t)


def remove_xml_str(s: str, xp: str) -> str | None:
    """RemoveXML: drop matched elements/attributes/text
    (func_remove_xml.go:43-75)."""
    if not s:
        return ""
    try:
        doc = _parse_doc(s)
        matches = _select(doc, xp)
    except (ET.ParseError, XMLArgError):
        return None
    for m in matches:
        if m[0] == "elem":
            parent, e = m[1], m[2]
            if e in parent.children:
                parent.children.remove(e)
        elif m[0] == "attr":
            owner, name = m[1], m[2]
            owner.attrs = [(k, v) for k, v in owner.attrs if k != name]
        elif m[0] == "text":
            owner, t = m[1], m[2]
            if t in owner.children:
                owner.children.remove(t)
    return _ser_doc(doc)


def convert_attributes_from_doc(doc: _Doc, xp: str = "//@*") -> str | None:
    """ConvertAttributesToElementsXML over a PRIVATE copy of an
    already-parsed doc (see ``remove_xml_from_doc``)."""
    doc = copy_doc(doc)
    try:
        matches = (
            _desc_attrs_docorder(doc) if xp in ("", "//@*") else _select(doc, xp)
        )
    except XMLArgError:
        return None
    _apply_attr_conversion(matches)
    return _ser_doc(doc)


def _apply_attr_conversion(matches: list) -> None:
    for m in matches:
        if m[0] != "attr":
            continue
        owner, name = m[1], m[2]
        val = dict(owner.attrs).get(name, "")
        owner.children.append(_Elem(name, [], [_Text(val)]))
        owner.attrs = [(k, v) for k, v in owner.attrs if k != name]


def convert_attributes_to_elements_str(s: str, xp: str = "//@*") -> str | None:
    """Each matched attribute becomes a last-child element of its owner
    (func_convert_attributes_to_elements_xml.go:44-68)."""
    try:
        doc = _parse_doc(s)
        matches = (
            _desc_attrs_docorder(doc) if xp in ("", "//@*") else _select(doc, xp)
        )
    except (ET.ParseError, XMLArgError):
        return None
    for m in matches:
        if m[0] != "attr":
            continue
        owner, name = m[1], m[2]
        val = dict(owner.attrs).get(name, "")
        owner.children.append(_Elem(name, [], [_Text(val)]))
        owner.attrs = [(k, v) for k, v in owner.attrs if k != name]
    return _ser_doc(doc)


def convert_text_to_elements_str(
    s: str, xp: str = "/", element_name: str = "value"
) -> str | None:
    """Wrap extraneous text nodes in a dedicated element
    (func_convert_text_to_elements_xml.go:66-116): a node whose children are
    exactly one text node (or no text) is left alone; any mix of multiple
    values/elements wraps every text child in <element_name>."""
    try:
        doc = _parse_doc(s)
        matches = _select(doc, xp)
    except (ET.ParseError, XMLArgError):
        return None

    def convert(parent, depth: int = 0):
        if depth > _MAX_DEPTH:
            raise XMLArgError("max depth")
        kids = getattr(parent, "children", [])
        n_elem = 0
        n_text = 0
        for c in kids:
            if isinstance(c, _Elem):
                convert(c, depth + 1)
                n_elem += 1
            elif isinstance(c, _Text):
                n_text += 1
        if n_text == 0 or n_elem + n_text <= 1:
            return
        for i, c in enumerate(kids):
            if isinstance(c, _Text):
                kids[i] = _Elem(element_name, [], [_Text(c.data)])

    for m in matches:
        if m[0] == "doc":
            convert(m[1])
        elif m[0] == "elem":
            convert(m[2])
    return _ser_doc(doc)


# ------------------------------------------------------------- Column API

def _map1(fn, ret="string"):
    @pandas_udf(ret)
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(v))

    return udf


def parse_xml(c: Column) -> Column:
    return _map1(parse_xml_str)(c.cast("string"))


def parse_simplified_xml(c: Column) -> Column:
    return _map1(parse_simplified_xml_str)(c.cast("string"))


def get_xml(c: Column, xp: str) -> Column:
    return _map1(lambda s: get_xml_str(s, xp))(c.cast("string"))


def insert_xml(c: Column, xp: str, sub: Column | str) -> Column:
    sub_col = sub if isinstance(sub, Column) else F.lit(sub)

    @pandas_udf("string")
    def udf(s: pd.Series, subs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if a is None else insert_xml_str(a, xp, b or "")
                for a, b in zip(s, subs)
            ]
        )

    return udf(c.cast("string"), sub_col.cast("string"))


def remove_xml(c: Column, xp: str) -> Column:
    return _map1(lambda s: remove_xml_str(s, xp))(c.cast("string"))


def convert_attributes_to_elements_xml(c: Column, xp: str = "//@*") -> Column:
    return _map1(lambda s: convert_attributes_to_elements_str(s, xp))(c.cast("string"))


def convert_text_to_elements_xml(
    c: Column, xp: str = "/", element_name: str = "value"
) -> Column:
    return _map1(lambda s: convert_text_to_elements_str(s, xp, element_name))(
        c.cast("string")
    )
