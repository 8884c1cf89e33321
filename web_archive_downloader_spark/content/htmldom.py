"""Minimal DOM for the extract/asset kernels.

The reference uses BeautifulSoup('html.parser')
(/root/reference/html_processor.py:30,210). bs4 is a production
dependency of the extract UDF; in environments where it is absent
(this sandbox) we fall back to this stdlib-only DOM which implements
the subset the reference exercises: ``find``/``find_all`` with
attribute filters, ``select_one`` for the config selectors
(#id / .class / tag / tag.class / descendant combinator), ``.string``
(single-text-child semantics, html_processor.py:78,82), attribute
get/set, and ``str(node)`` serialization for the markdown converter.

The dispatch lives in extract.py: ``import bs4`` is attempted first,
so with the real library installed behavior is byte-identical to the
reference; the fallback matches it on the fixture corpus (tested).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict[str, str] | None = None, parent: "Node | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[object] = []  # Node | str
        self.parent = parent

    # --- bs4-compatible surface (subset) ---
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    def __getitem__(self, key: str):
        return self.attrs[key]

    def __setitem__(self, key: str, value: str) -> None:
        self.attrs[key] = value

    @property
    def string(self):
        """bs4 .string: the single child if it is a text node, else None."""
        kids = [c for c in self.children if not (isinstance(c, str) and c == "")]
        if len(kids) == 1 and isinstance(kids[0], str):
            return kids[0]
        # bs4 also descends through a single-element chain
        if len(kids) == 1 and isinstance(kids[0], Node):
            return kids[0].string
        return None

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts: list[str] = []

        def walk(n: "Node") -> None:
            for c in n.children:
                if isinstance(c, str):
                    parts.append(c)
                else:
                    walk(c)

        walk(self)
        text = separator.join(parts)
        return text.strip() if strip else text

    def iter_nodes(self):
        """Pre-order document-order traversal (matches bs4 find_all)."""
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter_nodes()

    def find_all(self, names, **attr_filters) -> list["Node"]:
        if isinstance(names, str):
            names = [names]
        out = []
        for node in self.iter_nodes():
            if node.name not in names:
                continue
            ok = True
            for k, v in attr_filters.items():
                if v is True:
                    if k not in node.attrs:
                        ok = False
                        break
                else:
                    got = node.attrs.get(k)
                    # bs4 matches space-separated attr values (rel="x stylesheet")
                    if got is None or (got != v and v not in got.split()):
                        ok = False
                        break
            if ok:
                out.append(node)
        return out

    def find(self, names, **attr_filters) -> "Node | None":
        hits = self.find_all(names, **attr_filters)
        return hits[0] if hits else None

    # --- CSS selector subset ---
    def _matches_simple(self, simple: str) -> bool:
        """tag, #id, .class, tag.class, tag#id combinations."""
        import re

        tokens = re.findall(r"([#.]?[\w\-]+)", simple)
        for tok in tokens:
            if tok.startswith("#"):
                if self.attrs.get("id") != tok[1:]:
                    return False
            elif tok.startswith("."):
                classes = self.attrs.get("class", "").split()
                if tok[1:] not in classes:
                    return False
            else:
                if self.name != tok:
                    return False
        return True

    def select_one(self, selector: str) -> "Node | None":
        parts = selector.strip().split()
        for node in self.iter_nodes():
            if node._matches_simple(parts[-1]):
                # verify ancestor chain for descendant combinators
                remaining = parts[:-1]
                anc = node.parent
                i = len(remaining) - 1
                while i >= 0 and anc is not None:
                    if anc.name != "[document]" and anc._matches_simple(remaining[i]):
                        i -= 1
                    anc = anc.parent
                if i < 0 or not remaining:
                    return node
        return None

    # --- serialization ---
    def __str__(self) -> str:
        return serialize(self)

    def __repr__(self) -> str:
        return f"<Node {self.name}>"


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def serialize(node: Node) -> str:
    if node.name == "[document]":
        return "".join(
            serialize(c) if isinstance(c, Node) else _escape_text(c) for c in node.children
        )
    attrs = "".join(f' {k}="{_escape_attr(v)}"' for k, v in node.attrs.items())
    inner = "".join(
        serialize(c) if isinstance(c, Node) else _escape_text(c) for c in node.children
    )
    if node.name in VOID_ELEMENTS and not node.children:
        return f"<{node.name}{attrs}/>"
    return f"<{node.name}{attrs}>{inner}</{node.name}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # tolerate malformed nesting: pop back to nearest matching open tag
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # stray close tag: ignore (html.parser tolerance)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
