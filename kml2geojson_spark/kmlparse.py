"""Lightweight lxml-free state-machine KML/XML parser.

A single compiled-regex tokenizer drives a push-down tree builder — no
``xml.dom.minidom`` (the reference parses with minidom at
/root/reference/kml2geojson/main.py:586), no lxml. The produced
:class:`Element` tree reproduces the minidom behaviors the reference
relies on:

- ``getElementsByTagName`` == :meth:`Element.find_all`: preorder
  document-order descendant search by *literal* tag name — namespace
  prefixes like ``gx:Track`` are matched verbatim (minidom is
  prefix-literal; reference main.py:27-31).
- ``node.firstChild.wholeText.strip()`` == :meth:`Element.text`:
  concatenation of the leading run of logically-adjacent Text/CDATA
  children (a comment or child element breaks adjacency), stripped;
  empty string when the first child is absent or not character data
  (reference main.py:54-62 ``val``).
- ``getAttribute`` == :meth:`Element.attr`: "" when missing
  (reference main.py:46-51).

The tokenizer handles CDATA sections, XML comments (which appear inside
geometry containers in real KML), processing instructions, DOCTYPE
declarations, self-closing tags, and the five standard XML entities plus
numeric character references.

This module is deliberately dependency-free and allocation-light: it is
executed per-document inside Arrow-batched ``mapInPandas`` workers, so
documents stream through in columnar batches and the only per-row Python
is this parser (the engine never uses row-at-a-time Python UDFs).
"""

from __future__ import annotations

import re
from typing import Iterator, Optional
from xml.parsers import expat as _expat

# Token alternation order matters: CDATA and comments must win over the
# generic declaration branch, and close tags over open tags.
_TOKEN = re.compile(
    r"<!\[CDATA\[(?P<cdata>.*?)\]\]>"
    r"|<!--(?P<comment>.*?)-->"
    r"|<!(?P<decl>[^>]*)>"
    r"|<\?(?P<pi>.*?)\?>"
    r"|</\s*(?P<close>[^>\s]+)\s*>"
    r"|<(?P<open>[^\s/>!?][^\s/>]*)(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>])*?)(?P<selfclose>/?)>"
    r"|(?P<text>[^<]+)",
    re.S,
)

_ATTR = re.compile(r"([^\s=/]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)')")

_GI = _TOKEN.groupindex
_GI_CDATA = _GI["cdata"]
_GI_COMMENT = _GI["comment"]
_GI_CLOSE = _GI["close"]
_GI_OPEN = _GI["open"]
_GI_ATTRS = _GI["attrs"]
_GI_SELFCLOSE = _GI["selfclose"]
_GI_TEXT = _GI["text"]

_ENTITY = re.compile(r"&(#x?[0-9A-Fa-f]+|[A-Za-z][A-Za-z0-9]*);")

_NAMED_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}

# Child-node kind tags (kept as tiny tuples to minimize allocation):
# Element instance        -> element child
# ("t", str)              -> text node (entities decoded)
# ("c", str)              -> CDATA section (verbatim)
# ("#",)                  -> comment (breaks text adjacency, else ignored)
_COMMENT_NODE = ("#",)


def _decode_entities(s: str) -> str:
    if "&" not in s:
        return s

    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                return chr(int(body[2:], 16))
            except ValueError:
                return m.group(0)
        if body.startswith("#"):
            try:
                return chr(int(body[1:]))
            except ValueError:
                return m.group(0)
        return _NAMED_ENTITIES.get(body, m.group(0))

    return _ENTITY.sub(sub, s)


class Element:
    """One XML element: literal tag name, attribute dict, ordered children."""

    __slots__ = ("tag", "attributes", "children", "_tag_index")

    def __init__(self, tag: str, attributes: Optional[dict] = None):
        self.tag = tag
        self.attributes = attributes if attributes is not None else {}
        self.children: list = []
        self._tag_index: Optional[dict] = None

    # -- navigation ------------------------------------------------------

    def iter_elements(self) -> Iterator["Element"]:
        """Preorder traversal of descendant elements (not self)."""
        stack = [c for c in reversed(self.children) if type(c) is Element]
        while stack:
            el = stack.pop()
            yield el
            for c in reversed(el.children):
                if type(c) is Element:
                    stack.append(c)

    def _index(self) -> dict:
        """Lazy descendant-tag index (document order). The tree is
        immutable after parsing, so one traversal amortizes the ~10
        ``find`` calls the feature builder makes per placemark — the
        repeated-subtree-rescan cost the reference pays on every
        ``getElementsByTagName`` (main.py:31) is paid once here."""
        idx = self._tag_index
        if idx is None:
            idx = {}
            # inlined preorder walk (≡ iter_elements): saves the
            # generator suspension per element on the once-per-document
            # whole-tree index build
            stack = [c for c in reversed(self.children)
                     if type(c) is Element]
            while stack:
                el = stack.pop()
                lst = idx.get(el.tag)
                if lst is None:
                    idx[el.tag] = [el]
                else:
                    lst.append(el)
                for c in reversed(el.children):
                    if type(c) is Element:
                        stack.append(c)
            self._tag_index = idx
        return idx

    def find_all(self, tag: str) -> list["Element"]:
        """All descendant elements with the given literal tag, document order."""
        lst = self._index().get(tag)
        return list(lst) if lst else []

    def find(self, tag: str) -> Optional["Element"]:
        """First descendant element with the given literal tag, else None."""
        lst = self._index().get(tag)
        return lst[0] if lst else None

    def find_first(self, tag: str) -> Optional["Element"]:
        """Same result as :meth:`find` (first matching descendant in
        preorder) but via an early-exit walk with NO index build — the
        right call when a node is probed exactly once (the bulk tiling
        path's per-Point ``coordinates`` lookup), where building and
        caching the full subtree index is pure overhead. Uses a cached
        index when one already exists."""
        if self._tag_index is not None:
            lst = self._tag_index.get(tag)
            return lst[0] if lst else None
        for el in self.iter_elements():
            if el.tag == tag:
                return el
        return None

    # -- value access ----------------------------------------------------

    def attr(self, name: str) -> str:
        """Attribute value, "" when absent (minidom getAttribute)."""
        return self.attributes.get(name, "")

    def text(self) -> str:
        """Leading run of adjacent Text/CDATA children, concatenated and
        stripped — the reference's ``val`` (main.py:54-62 via minidom
        ``firstChild.wholeText``). Comments and child elements terminate
        the run; a non-character-data first child yields ""."""
        parts = []
        for child in self.children:
            t = type(child)
            if t is tuple:
                if child[0] == "#":  # comment breaks logical adjacency
                    break
                parts.append(child[1])
            else:
                break
        if not parts:
            return ""
        return "".join(parts).strip()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Element {self.tag} attrs={self.attributes} children={len(self.children)}>"


def parse_kml(source: str) -> Element:
    """Parse a KML/XML string into an :class:`Element` tree.

    Returns a synthetic document-root Element (tag ``None``-like sentinel
    ``"#document"``) whose descendants are the document's elements — the
    equivalent of minidom's ``Document`` node, so ``find_all`` from the
    root searches the entire document like the reference's
    ``get(root, ...)`` calls on the parsed Document (main.py:586).

    Two lanes, identical trees (asserted differentially on the golden
    fixtures, the synthetic corpus, and the grammar-fuzz corpus):
    well-formed documents are built by :func:`_parse_kml_expat` (stdlib
    expat tokenizes and normalizes in C — attribute-value normalization,
    entity expansion, §2.11 EOL handling — so Python runs only the three
    tree-building callbacks, measured ~1.9× the regex tokenizer);
    everything expat rejects falls back to :func:`_parse_kml_regex`,
    which is lenient on mismatched close tags (pops to the nearest
    matching open element; ignores unmatched closes) — real-world KML
    is messy and the engine processes untrusted corpora; strictness is
    not worth a failed partition at 10^12-document scale.
    """
    root = _parse_kml_expat(source)
    if root is not None:
        return root
    return _parse_kml_regex(source)


def _parse_kml_expat(source: str) -> Optional[Element]:
    """Expat-built Element tree, or ``None`` when the document is
    outside the envelope where expat's output provably matches the
    regex tokenizer's: any DOCTYPE bails (an internal DTD subset could
    declare entities that expat would expand but the regex lane leaves
    verbatim), and any well-formedness error bails to the lenient lane
    (mismatched/unclosed tags, undefined entities, ``<`` in attribute
    values, text outside the root, invalid character references, ...).

    Known inert representation differences vs the regex lane (no
    behavioral surface reads them — ``Element.text()`` joins adjacent
    character-data children and ``find*``/traversal skip non-Elements):
    expat may split one logical text run into several ``("t", ...)``
    children (buffer boundaries), and it drops ignorable whitespace
    between the XML declaration and the root element, where the regex
    lane keeps a root-level text child."""
    if "<!DOCTYPE" in source:
        return None
    root = Element("#document")
    stack = [root]
    in_cdata = False

    def start(name, attrs):
        el = Element(name, attrs)
        stack[-1].children.append(el)
        stack.append(el)

    def end(_name):
        stack.pop()

    def chardata(d):
        stack[-1].children.append(("c", d) if in_cdata else ("t", d))

    def cd_start():
        nonlocal in_cdata
        in_cdata = True

    def cd_end():
        nonlocal in_cdata
        in_cdata = False

    def comment(_d):
        stack[-1].children.append(_COMMENT_NODE)

    p = _expat.ParserCreate()
    p.buffer_text = True
    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chardata
    p.StartCdataSectionHandler = cd_start
    p.EndCdataSectionHandler = cd_end
    p.CommentHandler = comment
    try:
        p.Parse(source, True)
    except _expat.ExpatError:
        return None
    return root


def _parse_kml_regex(source: str) -> Element:
    """The original regex-tokenizer tree builder — the lenient lane
    (see :func:`parse_kml`)."""
    # XML 1.0 §2.11 end-of-line normalization (\r\n and lone \r → \n),
    # which minidom — and therefore the reference — applies to the whole
    # input including CDATA; Windows-authored KML differs without this.
    if "\r" in source:
        source = source.replace("\r\n", "\n").replace("\r", "\n")
    root = Element("#document")
    stack = [root]
    # Dispatch on m.lastindex (one attribute read) instead of probing
    # named groups: each alternation branch ends in a distinct group —
    # the open branch always participates through `selfclose` (an
    # always-matching `/?`), so its lastindex is _GI_SELFCLOSE.
    # (m.lastgroup would be masked the same way, but to the RIGHT value.)
    for m in _TOKEN.finditer(source):
        li = m.lastindex
        if li == _GI_TEXT:
            s = m.group(_GI_TEXT)
            stack[-1].children.append(
                ("t", _decode_entities(s) if "&" in s else s))
        elif li == _GI_SELFCLOSE:
            open_tag, attrs_src, selfclose = m.group(
                _GI_OPEN, _GI_ATTRS, _GI_SELFCLOSE)
            attrs = {}
            if attrs_src:
                for am in _ATTR.finditer(attrs_src):
                    v = am.group(2) if am.group(2) is not None else am.group(3)
                    # XML 1.0 §3.3.3 attribute-value normalization:
                    # literal tab/newline become spaces (minidom parity)
                    if "\t" in v or "\n" in v:
                        v = v.replace("\t", " ").replace("\n", " ")
                    attrs[am.group(1)] = _decode_entities(v)
            el = Element(open_tag, attrs)
            stack[-1].children.append(el)
            if not selfclose:
                stack.append(el)
        elif li == _GI_CLOSE:
            tag = m.group(_GI_CLOSE)
            if len(stack) > 1 and stack[-1].tag == tag:
                stack.pop()  # well-formed fast path
            else:
                # pop to matching open; ignore stray close tags
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == tag:
                        del stack[i:]
                        break
        elif li == _GI_CDATA:
            stack[-1].children.append(("c", m.group(_GI_CDATA)))
        elif li == _GI_COMMENT:
            stack[-1].children.append(_COMMENT_NODE)
        # decl / pi: skipped entirely
    return root
